package graft

/** Throwaway profiling harness for the pageRank ROUND internals — NOT a
  * spec. Decomposes one round into its components so the expensive part
  * is identified by measurement (guide §1.1) before anything changes.
  * Run: sbt "Test/runMain graft.GraphRoundProbe /root/testdata/sf0.1 32"
  */
object GraphRoundProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).appName("graph-round-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[round-probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val or = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))

    System.err.println("[round-probe] edges leaf bytes: " +
      edges.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes).sum)
    val g = graft.operators.Graph
    val e = g.prepareEdges(edges, "src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edge materialize")(e.count())
    val nodes = g.nodeOutdeg(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val state = g.initState(e, 1000000000L).localCheckpoint(true)
    val n = state.count()
    System.err.println(s"[round-probe] |E|=${e.count()} n=$n")

    // task-level attribution for one round: run time vs deser vs GC vs
    // scheduler delay, per stage
    val taskAgg = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = taskAgg.computeIfAbsent(e.stageId, _ => new Array[Long](6))
          a.synchronized {
            a(0) += 1
            a(1) += m.executorRunTime
            a(2) = math.max(a(2), m.executorRunTime)
            a(3) += m.executorDeserializeTime
            a(4) += m.jvmGCTime
            a(5) += m.resultSerializationTime
          }
        }
      }
    })

    // synthetic twin of the edge cache: same row count, same shape —
    // distinguishes "our cache is slow" from "this machine's per-row
    // rate is what it is"; compressed vs uncompressed vs no cache
    def synBase = spark.range(0L, 1173742L, 1L, 32)
      .select(col("id").as("src"), (col("id") % 16000L).as("dst"))
      .repartition(col("src"))
    val syn = synBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    syn.count()
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    val synU = synBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synU.count()
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    (1 to 3).foreach { i =>
      t(s"synthetic compressed cache agg (pass $i)")(
        force(syn.groupBy(col("dst")).agg(sum(col("src")))))
      t(s"synthetic UNcompressed cache agg (pass $i)")(
        force(synU.groupBy(col("dst")).agg(sum(col("src")))))
    }
    // cached vs UNCACHED twin for join+agg: if the uncached variant
    // (whole path codegen over a range source, plus an extra exchange)
    // beats the cached one, the InMemoryTableScan path is the problem
    val bSide = spark.range(0L, 16000L).select(col("id").as("src"),
      (col("id") * 3L).as("__c"))
    (1 to 3).foreach { i =>
      t(s"cached join+agg twin (pass $i)")(force(
        syn.join(bSide.hint("shuffle_hash"), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("__c")))))
      t(s"UNcached join+agg twin (pass $i)")(force(
        synBase.join(bSide.hint("shuffle_hash"), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("__c")))))
    }
    syn.unpersist(blocking = false)
    synU.unpersist(blocking = false)

    (1 to 3).foreach { i =>
      t(s"cache scan only (pass $i)")(force(e.select(sum(col("src") + col("dst")))))
      val contribs = state.filter(col("outdeg") > 0L)
        .select(col("id").as("src"), expr("rank div outdeg").as("__c"))
      t(s"join only, no agg (pass $i)")(force(
        e.join(contribs.hint("shuffle_hash"), Seq("src"))
          .select(sum(col("dst") + col("__c")))))
      t(s"agg only, no join (pass $i)")(force(
        e.groupBy(col("dst").as("id")).agg(sum(col("src")).as("__in"))))
      val shj = e.join(contribs.hint("shuffle_hash"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("__c")).as("__in"))
      t(s"SHJ join+agg (pass $i)")(force(shj))
      if (i == 3) System.err.println("[round-probe] inbound final plan:\n" +
        shj.queryExecution.executedPlan.toString)
      t(s"BHJ join+agg, no hint (pass $i)")(force(
        e.join(contribs, Seq("src"))
          .groupBy(col("dst").as("id")).agg(sum(col("__c")).as("__in"))))
      if (i == 1) {
        val rp = g.round(e, nodes, state, n, 150000000L, 17L, 20L, 0L, parts = 1)
          .queryExecution.executedPlan
        val shown = rp match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan.toString
          case p => p.toString
        }
        System.err.println("[round-probe] ROUND initial plan:\n" + shown)
      }
      t(s"full round, no ckpt (pass $i)")(force(
        g.round(e, nodes, state, n, 150000000L, 17L, 20L, 0L, parts = 1)))
      t(s"full round + eager ckpt (pass $i)") {
        val ck = g.round(e, nodes, state, n, 150000000L, 17L, 20L, 0L, parts = 1)
          .localCheckpoint(true)
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(ck)
      }
    }
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    import scala.jdk.CollectionConverters._
    taskAgg.asScala.toSeq.sortBy(_._1).foreach { case (sid, a) =>
      System.err.println(f"[round-probe] stage $sid%4d tasks=${a(0)}%3d " +
        f"runSum=${a(1)}%6d ms runMax=${a(2)}%5d deserSum=${a(3)}%5d " +
        f"gcSum=${a(4)}%5d resSerSum=${a(5)}%4d")
    }
    spark.stop()
  }
}
