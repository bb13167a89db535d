package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL registration of graft's custom expressions, so `spark.sql` users
  * can call them directly (`SELECT jaro_winkler(a, b) ...`). Used by
  * [[graft.GraftExtensions]] (the `spark.sql.extensions` hook) and
  * registrable on an existing session via [[register]].
  */
object GraftSqlFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def boolArg(e: Expression, fn: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal boolean argument, got $other")
  }

  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (c: Seq[Expression]) => JaroWinklerSimilarity(c(0), c(1))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (c: Seq[Expression]) => SimHash64(c(0))),
    (FunctionIdentifier("simhash_text"),
      info("simhash_text", "simhash_text(text) - one-pass lowercase+tokenize+SimHash"),
      (c: Seq[Expression]) => SimHashText(c(0))),
    (FunctionIdentifier("shingle_hashes64"),
      info("shingle_hashes64", "shingle_hashes64(text, n) - sorted distinct n-gram shingle hashes"),
      (c: Seq[Expression]) => ShingleHashes64(c(0), intArg(c(1), "shingle_hashes64"))),
    (FunctionIdentifier("minhashes"),
      info("minhashes", "minhashes(hashes, k) - K-member MinHash signature"),
      (c: Seq[Expression]) => MinHashes(c(0), intArg(c(1), "minhashes"))),
    (FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(a, b) - Jaccard of sorted long arrays"),
      (c: Seq[Expression]) => SortedLongJaccard(c(0), c(1))),
    (FunctionIdentifier("text_stats"),
      info("text_stats", "text_stats(text) - struct of per-document counts"),
      (c: Seq[Expression]) => TextStats(c(0))),
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of numeric arrays"),
      (c: Seq[Expression]) => VectorDot(asDoubleArray(c(0)), asDoubleArray(c(1)))),
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine similarity (0 on zero norm)"),
      (c: Seq[Expression]) => VectorCosine(asDoubleArray(c(0)), asDoubleArray(c(1)))),
    (FunctionIdentifier("vector_l2_normalize"),
      info("vector_l2_normalize", "vector_l2_normalize(a) - unit-length copy"),
      (c: Seq[Expression]) => VectorL2Normalize(asDoubleArray(c(0)))),
    (FunctionIdentifier("vector_lsh_bucket"),
      info("vector_lsh_bucket", "vector_lsh_bucket(a, nBits) - hyperplane-sign LSH bucket"),
      (c: Seq[Expression]) => VectorLshBucket(asDoubleArray(c(0)),
        intArg(c(1), "vector_lsh_bucket"), 42L)),
    (FunctionIdentifier("chunk_text"),
      info("chunk_text",
        "chunk_text(text, maxTokens, overlap) - sliding token-window chunks"),
      (c: Seq[Expression]) => ChunkText(c(0), intArg(c(1), "chunk_text"),
        intArg(c(2), "chunk_text"))),
    (FunctionIdentifier("collect_smallest"),
      info("collect_smallest",
        "collect_smallest(x, limit[, distinct]) - the limit smallest values per group, " +
          "sorted; bounded aggregation buffer (safe on pathologically hot groups)"),
      (c: Seq[Expression]) => CollectSmallest(c(0), intArg(c(1), "collect_smallest"),
        if (c.length >= 3) boolArg(c(2), "collect_smallest") else false)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}
