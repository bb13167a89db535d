package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long = 1000000000L): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters = iters, scale = scale)
      .as[(Long, Long)].collect().toMap

  test("pageRank: hand-computed two-node cycle is exact") {
    // 1 ⇄ 2, scale 1000, damping 17/20: base = 1000*3/20 = 150.
    // Symmetric, no dangling: every iteration rank = 150 + 17*1000/20 = 1000.
    val out = ranks(Seq((1L, 2L), (2L, 1L)), iters = 3, scale = 1000L)
    assert(out == Map(1L -> 1000L, 2L -> 1000L))
  }

  test("pageRank: hand-computed chain with dangling sink, one iteration") {
    // 1 → 2 → 3; node 3 dangling. scale 1000, base 150, N = 3.
    // iter 1: dangling = rank(3) = 1000, dangShare = 333.
    //   in(2) = 1000 div 1 = 1000; in(3) = 1000; in(1) = 0.
    //   rank(1) = 150 + 17 *  333          div 20 = 150 + 283 = 433
    //   rank(2) = 150 + 17 * (1000 + 333)  div 20 = 150 + 1133 = 1283
    //   rank(3) likewise = 1283
    val out = ranks(Seq((1L, 2L), (2L, 3L)), iters = 1, scale = 1000L)
    assert(out == Map(1L -> 433L, 2L -> 1283L, 3L -> 1283L))
  }

  test("pageRank: iters = 0 returns the uniform initial mass") {
    val out = ranks(Seq((1L, 2L), (2L, 3L)), iters = 0, scale = 777L)
    assert(out == Map(1L -> 777L, 2L -> 777L, 3L -> 777L))
  }

  test("pageRank: star center out-ranks its spokes") {
    val spokes = (2L to 9L)
    val edges = spokes.flatMap(s => Seq((s, 1L), (1L, s)))
    val out = ranks(edges, iters = 8)
    assert(spokes.forall(s => out(1L) > out(s)))
    assert(spokes.map(out).toSet.size == 1) // spokes symmetric → identical
  }

  test("pageRank: mass is conserved up to floor-division truncation") {
    // per-iteration truncation loss L < |E| (contrib divs) + N
    // (dangling div) + N (damping divs) + 1; the teleport term pumps
    // lost mass back, so the steady-state deficit is bounded by
    // L / (1 - d) = L * 20/3 ≈ 110 units here — invisible at
    // nano-rank resolution but asserted to stay bounded, not drift
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 1L))
    val out = ranks(edges, iters = 6)
    val total = out.values.sum
    val n = out.size
    assert(out.size == 5)
    assert(total <= n * 1000000000L)
    assert(total >= n * 1000000000L - 1000L)
  }

  test("pageRank: bit-identical across partitioning layouts (retry-determinism)") {
    val edges = (1L to 200L).map(i => (i, i * 7 % 97 + 1)).toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(1), iters = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.repartition(13, col("dst")), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRank: parallel edges collapse, self-loops and nulls handled") {
    // duplicate edge (1,2) must count once in outdeg; 3's self-loop is
    // an ordinary edge; the null-endpoint EDGE vanishes entirely (node
    // 9 has no surviving edge, so it is not a node of the graph)
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L))
    ).toDF("src", "dst")
    val dup = Graph.pageRank(edges, iters = 2).as[(Long, Long)].collect().toMap
    // hand-replay at N=3 (nodes 1,2,3), scale 1e9, base 1.5e8: the
    // exact values below hold ONLY if the duplicate edge collapsed
    // (outdeg(1) = 1 — an outdeg of 2 would halve node 2's inbound)
    assert(dup == Map(1L -> 513611110L, 2L -> 881944443L,
      3L -> 1604444443L))
  }

  test("pageRank: an edge frame with no usable edges returns an empty mapping") {
    val out = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("src", "dst")
    assert(Graph.pageRank(out, iters = 3).count() == 0)
  }

  test("pageRank: rejects nonsense damping and iteration counts") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = -1))
    intercept[IllegalArgumentException](Graph.pageRank(e, dampNum = 21L, dampDen = 20L))
    intercept[IllegalArgumentException](Graph.pageRank(e, scale = 0L))
  }
}
