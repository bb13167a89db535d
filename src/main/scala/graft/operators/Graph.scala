package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality for corpus curation.
  *
  * Web-scale training corpora weight and filter documents by the
  * standing of their source in the link graph (Common Crawl publishes
  * harmonic-centrality / PageRank domain rankings for exactly this
  * purpose). This operator computes PageRank over an arbitrary
  * (src, dst) edge frame as iterative key-partitioned joins — no
  * driver-side graph materialization, so it scales to edge sets that
  * never fit one machine.
  *
  * Determinism by design: ranks are carried as FIXED-POINT integers
  * (`scale` units = rank 1.0, default nano-rank 1e9), all updates are
  * integer multiply/divide, and every aggregation is a sum of longs —
  * associative and exact. A float PageRank changes in the last ulps
  * whenever Spark re-orders a partial sum (task retry, AQE coalesce,
  * speculative execution); this one returns bit-identical ranks on
  * every run, which makes it safe to hash-compare, cache, and
  * incrementally diff — and lets an external engine replay the exact
  * recurrence (see [[graft.OracleSqlGen.pageRank]]).
  *
  * Update rule (classic damped PageRank, Page et al. 1999, with
  * dangling-mass redistribution):
  * {{{
  *   contrib(u)  = rank(u) div outdeg(u)                 (u non-dangling)
  *   dangShare   = sum(rank(d) for dangling d) div N
  *   rank'(v)    = base + dampNum * (inbound(v) + dangShare) div dampDen
  *   base        = scale * (dampDen - dampNum) div dampDen
  * }}}
  * All divisions are floor divisions on non-negative longs (Scala `/`
  * and DuckDB `//` agree there). Truncation loses at most 1 unit per
  * division — at nano-rank resolution a relative error of 1e-9 per
  * step, irrelevant for ranking and identical on every engine.
  *
  * Overflow bound: the damping multiply is the widest intermediate —
  * `dampNum * totalMass` with totalMass = N * scale must stay under
  * 2^63, so at the default scale=1e9, dampNum=17 the operator is safe
  * to ~5×10^8 nodes; drop `scale` to 1e6 for a 5×10^11-node graph.
  * (Spark 4 runs ANSI mode: an overflow would throw loudly, never
  * wrap silently.)
  *
  * Scale shape per iteration: one shuffle of (dst, contrib) pairs for
  * the inbound sum (map-side partial aggregation — combiner runs
  * before the shuffle) and one key-partitioned join of the state frame
  * with that sum; the edge frame is deduped, persisted ALREADY
  * hash-partitioned on src (its one setup shuffle also serves the
  * dedup aggregate — subset-key co-location — and every round's
  * contribution join), and reused across iterations. The dangling
  * total rides each round's own checkpoint materialization as an
  * Observation metric (r17: previously a 1-row aggregate + broadcast
  * subtree per round) and enters the next round as a literal, so one
  * round = one job with no side jobs; per-round driver state is two
  * longs (loop counter, dangling mass). Each round is
  * `localCheckpoint`ed — lineage would otherwise grow with the
  * iteration count — and the superseded round's storage is released
  * eagerly ([[GraftBridge.unpersistCheckpoint]]); on a real cluster
  * prefer reliable `checkpoint()`.
  *
  * Fixed `iters` rather than a convergence test: curation wants a
  * reproducible artifact, and a convergence probe would cost an extra
  * global aggregate per round for a stopping point that data drift
  * then moves between runs.
  *
  * Semantics notes: parallel edges collapse (`DISTINCT src, dst`);
  * self-loops are ordinary edges (count toward outdeg, contribute to
  * self); NULL endpoints are dropped; nodes appearing only as `dst`
  * are dangling (outdeg 0).
  */
object Graph {

  /** PageRank over `edges(srcCol, dstCol)` (long-compatible ids).
    * Returns (id LONG, rank LONG) — rank in `scale` fixed-point units,
    * total mass ≈ N * scale.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 8, scale: Long = 1_000_000_000L,
               dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen outside [0, 1]")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = prepareEdges(edges, srcCol, dstCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val setupT0 = System.nanoTime()
      if (sys.env.contains("GRAFT_DEBUG_PR")) {
        val ec = e.count()
        System.err.println(s"[pageRank] edge materialize: " +
          s"${(System.nanoTime() - setupT0) / 1e9}s, |E|=$ec")
      }
      // r17 opt: N and each round's dangling mass ride the checkpoint
      // materialization itself as Observation metrics (exact integer
      // sums — same values the old 1-row aggregate computed), so a
      // round is ONE job with no separate dangling-aggregate subtree
      // and no per-round BroadcastExchange: the mass enters the next
      // round's arithmetic as a literal. Bounded driver state: two
      // longs per round.
      val obs0 = Observation()
      var state = initState(e, scale)
        .observe(obs0, count(lit(1)).as("n"), danglingMass)
        .localCheckpoint(true)
      val n = obs0.get("n").asInstanceOf[Long]
      var dang = obs0.get("dang").asInstanceOf[Long]
      if (sys.env.contains("GRAFT_DEBUG_PR"))
        System.err.println(s"[pageRank] setup (edges + degrees + initial " +
          s"state): ${(System.nanoTime() - setupT0) / 1e9}s, n=$n")
      val base = scale * (dampDen - dampNum) / dampDen
      if (n == 0) return state.select(col("id"), col("rank")) // empty graph
      for (it <- 0 until iters) {
        val roundT0 = System.nanoTime()
        val obs = Observation()
        val next = round(e, state, n, base, dampNum, dampDen, dang)
          .observe(obs, danglingMass)
          .localCheckpoint(true)
        dang = obs.get("dang").asInstanceOf[Long]
        GraftBridge.unpersistCheckpoint(state)
        state = next
        if (sys.env.contains("GRAFT_DEBUG_PR"))
          System.err.println(s"[pageRank] round ${it + 1}: " +
            s"${(System.nanoTime() - roundT0) / 1e9}s")
      }
      state.select(col("id"), col("rank"))
    } finally e.unpersist(blocking = false)
  }

  /** Total rank mass on sinks — the Observation metric each round's
    * materialization carries (exact long sum, order-independent). */
  private def danglingMass: org.apache.spark.sql.Column =
    coalesce(sum(when(col("outdeg") === 0L, col("rank"))), lit(0L)).as("dang")

  /** ONE setup shuffle on src: the distinct's Aggregate(src, dst)
    * requires only co-location on a subset of its keys, so the explicit
    * HashPartitioning(src) satisfies it with no second exchange — and
    * every ITERATION's contribution join then reuses the same
    * partitioning (the per-round shuffle carries the small state frame,
    * never the edges). */
  private[graft] def prepareEdges(edges: DataFrame, srcCol: String,
                                  dstCol: String): DataFrame =
    edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .distinct()

  /** Initial (id, outdeg, rank = scale) state over the node set. */
  private[graft] def initState(e: DataFrame, scale: Long): DataFrame = {
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    nodes.join(outdeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(scale).as("rank"))
  }

  /** One PageRank round over (id, outdeg, rank) `state` — extracted so
    * the per-round physical plan itself sits under a PlanSpec pin (the
    * final query plan is just the last checkpoint's LogicalRDD, which
    * would hide a regression here). */
  private[graft] def round(e: DataFrame, state: DataFrame, n: Long,
                           base: Long, dampNum: Long, dampDen: Long,
                           dang: Long): DataFrame = {
    // the dangling share enters as a LITERAL (r17 opt): the previous
    // round's Observation already summed the sink mass exactly, so the
    // old 1-row aggregate + BroadcastExchange subtree is gone — both
    // floor divisions on non-negative longs, identical arithmetic
    val dangShare = dang / n
    // (dst, rank div outdeg) summed per dst — partial-aggregated
    // map-side, so the shuffle carries one row per (task, dst); the
    // contribution is computed BEFORE the join so the edge-side probe
    // carries one long, not (rank, outdeg)
    val contribs = state.filter(col("outdeg") > 0L)
      .select(col("id").as("src"), expr("rank div outdeg").as("__c"))
    // SHUFFLE_HASH on the state-sized side (r17 opt, guide §3.1): the
    // planner's sort-merge would re-SORT the cached 100 TB-side edge
    // frame every round (measured: the join stage dominated each
    // round); hashing the per-partition state slice — bounded by
    // N/partitions rows — streams the edges unsorted. Same rows out,
    // different join algorithm only.
    val inbound = e.join(contribs.hint("shuffle_hash"), Seq("src"))
      .groupBy(col("dst").as("id"))
      .agg(sum(col("__c")).as("__in"))
    // `div` (not `/`): Column./ is DOUBLE division even on longs,
    // which would silently forfeit the exact-integer contract
    state.join(inbound.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("outdeg"),
        expr(s"$base + ($dampNum * (coalesce(__in, CAST(0 AS BIGINT)) + $dangShare)) " +
          s"div $dampDen").cast("long").as("rank"))
  }
}
