package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick brown fox jumps over the lazy dog"), // exact dup modulo ws/case
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different content about spark engines"),
    (5L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup clusters normalized-identical texts") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("minhash LSH finds near and exact duplicates, canonical pair order") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id",
        shingleSize = 4, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 5L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("simhash pairs identical and near-identical docs within hamming bound") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 6, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 5L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("ngram jaccard: identical = 1.0, disjoint absent") {
    val blocked = docs.withColumn("blk", lit("all"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "text", "doc_id", "blk", n = 3)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((4L, 5L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.7 && pairs((1L, 3L)) < 1.0)
  }

  test("embedding near-dup finds identical vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.99f, 0.1f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, "embedding", "vec_id",
        threshold = 0.95, lshBits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }
}
