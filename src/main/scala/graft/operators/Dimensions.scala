package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-maintenance operators — the Kettle signature steps the
  * reference's transformation family implies but its KTR never wires
  * (`Insert / Update`, `Dimension lookup/update`): keyed upsert and
  * type-2 slowly-changing-dimension history. Both are expressed as
  * joins + unions over immutable frames (Spark has no in-place MERGE
  * without a table format; the caller rewrites the dimension path —
  * at dimension scale that rewrite is the cheap part of the job).
  */
object Dimensions {

  /** Keyed upsert: `updates` rows win on key collision, `existing`
    * rows pass through otherwise, new keys append. One anti-join (the
    * update keyset broadcasts at dimension scale) + one union — the
    * whole dimension never shuffles on anything but the key.
    * Schemas must agree by name ([[DataFrame.unionByName]] enforces).
    */
  def upsert(existing: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    // duplicate update keys would BOTH survive the union, breaking the
    // keyed-dimension invariant this operator exists to maintain —
    // enforced like scd2Apply's change batch (dedupe the CDC feed first)
    val dupKeys = updates.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1)
    require(dupKeys.isEmpty,
      s"upsert: multiple update rows for one key: " +
        dupKeys.select(keys.map(col): _*).limit(5).collect().mkString(", "))
    val keyset = updates.select(keys.map(col): _*).distinct()
    updates.unionByName(existing.join(keyset, keys, "left_anti"))
  }

  /** Type-2 SCD apply: fold one batch of `changes` (at most one row
    * per key — enforced) into a validity-interval dimension.
    *
    *  - an OPEN dim row (NULL `toCol`) whose tracked attributes differ
    *    from its change closes at the change's `effectiveCol`, and the
    *    change opens a new row;
    *  - an open row whose attributes already match its change is left
    *    untouched (no spurious version);
    *  - a change for an unseen key opens the key's first row;
    *  - CLOSED history rows pass through verbatim.
    *
    * `changes` must carry `keys ++ attrCols ++ effectiveCol`; output
    * has the dimension's (keys ++ attrCols ++ fromCol ++ toCol) shape.
    * Attribute comparison is null-safe (a NULL attr equals NULL).
    *
    * Scale shape: one equi-join of the OPEN slice against the change
    * batch (change batches are small next to history — broadcast), a
    * column-level close/open rewrite, and a union with the untouched
    * closed history, which never joins anything.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                attrCols: Seq[String], fromCol: String, toCol: String,
                effectiveCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2Apply needs at least one key column")
    require(attrCols.nonEmpty, "scd2Apply needs at least one tracked attribute")

    val closed = dim.filter(col(toCol).isNotNull)
    // explicit presence markers on BOTH join sides: testing presence
    // via a data column's NULL-ness would silently delete an open row
    // whose fromCol happens to be NULL (or drop a change whose
    // effective date is NULL) — markers are never NULL except where
    // the full-outer join itself produced the absence
    val open = dim.filter(col(toCol).isNull)
      .withColumn("__has_open", lit(true))

    val ch = changes.select(
      (keys.map(col) ++ attrCols.map(c => col(c).as(s"__new_$c")) :+
        col(effectiveCol).as("__eff")): _*)
      .withColumn("__has_change", lit(true))
    // one change per key per batch, or "which version wins" is undefined
    val dupKeys = ch.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    require(dupKeys.isEmpty,
      s"scd2Apply: multiple changes for one key in a single batch: " +
        dupKeys.select(keys.map(col): _*).limit(5).collect().mkString(", "))
    // a NULL effective date has no defined close/open point — reject it
    // loudly rather than silently treating the change as a no-op
    require(ch.filter(col("__eff").isNull).isEmpty,
      "scd2Apply: changes with a NULL effective value: " +
        ch.filter(col("__eff").isNull).select(keys.map(col): _*)
          .limit(5).collect().mkString(", "))

    val joined = open.join(ch, keys, "full_outer")
    val changed = attrCols
      .map(c => !(col(c) <=> col(s"__new_$c")))
      .reduce(_ || _)
    val hasChange = coalesce(col("__has_change"), lit(false))
    val hasOpen = coalesce(col("__has_open"), lit(false))
    val toType = dim.schema(toCol).dataType

    // surviving open/closed versions of pre-existing open rows
    val existingRows = joined.filter(hasOpen)
      .select((keys.map(col) ++ attrCols.map(col) :+ col(fromCol) :+
        when(hasChange && changed, col("__eff").cast(toType))
          .otherwise(lit(null).cast(toType))
          .as(toCol)): _*)
    // freshly opened versions: changed attrs or brand-new keys
    val openedRows = joined.filter(hasChange && (!hasOpen || changed))
      .select((keys.map(col) ++
        attrCols.map(c => col(s"__new_$c").as(c)) :+
        col("__eff").cast(dim.schema(fromCol).dataType).as(fromCol) :+
        lit(null).cast(toType).as(toCol)): _*)

    closed.select((keys ++ attrCols :+ fromCol :+ toCol).map(col): _*)
      .unionByName(existingRows)
      .unionByName(openedRows)
  }
}
