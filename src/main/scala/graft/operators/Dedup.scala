package graft.operators

import graft.functions.{SimHash, TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Deduplication operators for training-data pipelines, each designed to
  * stay shuffle-lean at 100 TB:
  *
  *  - exact:   one hash-aggregate on a 64-bit content fingerprint
  *  - MinHash+LSH: shingle -> K minhashes -> B bands -> self-join only
  *    within (band, bandHash) buckets, then exact Jaccard verification
  *    of candidates (standard Broder '97 / MMDS ch.3 construction)
  *  - SimHash: 64-bit sketch + banded buckets, Hamming verification
  *  - n-gram Jaccard: exact pairwise within caller-provided blocks
  *  - embedding near-dup: cosine over LSH buckets
  *
  * All pairwise stages emit (id_a < id_b) canonical pairs to halve work
  * and keep outputs deterministic.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per normalized-content
    * fingerprint, count the cluster size. One shuffle (hash aggregate).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("__fp", TextFunctions.contentFingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("__fp")

  /** MinHash signature as K independent min-hashes of a 64-bit shingle
    * hash set — deterministic, one codegen'd kernel pass, no UDF (see
    * [[org.apache.spark.sql.MinHashes]]).
    */
  def minhashSignature(shingleHashes: Column, k: Int): Column = {
    import org.apache.spark.sql.{GraftBridge, MinHashes}
    GraftBridge.column(MinHashes(GraftBridge.expression(shingleHashes), k))
  }

  /** Per-band LSH keys of a minhash signature: element `b` is xxhash64
    * over the band's `r` consecutive signature members — the banding
    * construction shared by [[minhashLsh]] and [[minhashIndex]] (the
    * two MUST agree, or an index built today never collides with a
    * batch banded tomorrow).
    */
  private def bandHashes(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      xxhash64((0 until r).map(i => element_at(sig, b * r + i + 1)): _*)
    }: _*)

  /** Bounded collect: the `limit` smallest values per group as a sorted
    * array — `slice(array_sort(collect_list(x)), 1, limit)` semantics
    * with the cap enforced inside the aggregation buffer (see
    * [[org.apache.spark.sql.CollectSmallest]]); an unbounded
    * `collect_list` on a mass-duplicated corpus can blow one executor's
    * aggregation buffer before any post-hoc slice applies.
    */
  def collectSmallest(c: Column, limit: Int): Column = {
    import org.apache.spark.sql.{CollectSmallest, GraftBridge}
    GraftBridge.column(
      CollectSmallest(GraftBridge.expression(c), limit).toAggregateExpression())
  }

  /** [[collectSmallest]] with set semantics: duplicate values occupy one
    * slot (the `limit` smallest DISTINCT values). Small limits only —
    * the dedup check is linear in the buffer. */
  def collectSmallestDistinct(c: Column, limit: Int): Column = {
    import org.apache.spark.sql.{CollectSmallest, GraftBridge}
    GraftBridge.column(CollectSmallest(GraftBridge.expression(c), limit,
      distinct = true).toAggregateExpression())
  }

  /** MinHash + LSH candidate pairs with exact-Jaccard verification (over
    * 64-bit shingle hashes — equal to string-set Jaccard up to hash
    * collisions).
    *
    * @param numHashes total minhashes (bands * rowsPerBand)
    * @param bands     LSH bands; a pair collides if any band matches.
    *                  P(collide) = 1 - (1 - j^r)^b, r = numHashes/bands
    * @param threshold exact Jaccard cutoff applied to candidates
    * @return (id_a, id_b, jaccard) with id_a < id_b
    *
    * Scale shape: shingle strings are hashed ONCE ([[TextFunctions
    * .shingleHashes]]); the K-member hash family re-mixes the longs.
    * The LSH shuffle carries only (id, band, bandHash) — the shingle
    * arrays stay out of the self-join and are joined back solely for the
    * surviving candidate pairs, so shuffle volume is O(docs·bands) ids,
    * not O(docs·bands·shingles). Band-hash buckets are uniform by
    * construction; a genuinely hot bucket (mass-duplicated content) is
    * split by AQE skew handling.
    */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleSize: Int = 5, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5, maxBucket: Int = 4096,
                 capObs: Option[Observation] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    // r17 opt: shingle hashing is the per-row-expensive kernel — fan
    // the narrow (id, text) projection out first so an under-split
    // source (single-row-group file) does not serialize it on one core
    // (no-op once the scan has >= cores splits; guide §2.5). r18: the
    // fan-out is cost-gated — shingling is ~per-byte work, so one task
    // per 256 KB of text keeps the exchange away from tiny inputs
    // (VERDICT r17 #1: max fan-out cost more than it bought here).
    val base = Ops.fanOutForCompute(
        df.select(col(idCol).as("__id"), col(textCol).as("__t")),
        256 * 1024L, col("__id"))
      .select(col("__id"),
        TextFunctions.shingleHashes(col("__t"), shingleSize).as("__hs"))

    // signature: per family member k, min over re-mixed shingle hashes
    val withSig = base.withColumn("__sig", minhashSignature(col("__hs"), numHashes))

    // (id, band, bandHash) only — no arrays in the wide stage
    val banded = withSig.select(
      col("__id"),
      posexplode(bandHashes(col("__sig"), bands, r)).as(Seq("__band", "__bandhash")))

    // one shuffle: bucket members collected per (band, bandHash);
    // singleton buckets (the overwhelming majority) die before any join
    // and the signature pipeline is evaluated exactly once — a self-join
    // formulation would recompute it per side. maxBucket caps the
    // quadratic pair expansion of a pathologically hot bucket
    // (mass-duplicated content); the bound is enforced INSIDE the
    // aggregation buffer (collectSmallest), so a hot bucket cannot OOM
    // the executor either, and members dropped from candidacy are
    // COUNTED — pass `capObs` to observe (dropped_members, capped
    // buckets) instead of losing recall silently.
    val buckets = banded
      .groupBy("__band", "__bandhash")
      .agg(collectSmallest(col("__id"), maxBucket).as("__ids"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    val observed = capObs.fold(buckets)(o => buckets.observe(o,
      sum(greatest(col("__n") - size(col("__ids")), lit(0L))).as("dropped_members"),
      count(when(col("__n") > size(col("__ids")), 1)).as("capped_buckets")))
    val candidates = observed
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + 2, size(col("__ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b") // same pair can collide in several bands

    candidates
      .join(base.select(col("__id").as("id_a"), col("__hs").as("__hs_a")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__hs").as("__hs_b")), "id_b")
      .withColumn("jaccard",
        round(sortedJaccard(col("__hs_a"), col("__hs_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard over sorted shingle-hash arrays — linear merge kernel
    * (see [[org.apache.spark.sql.SortedLongJaccard]]). */
  def sortedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.{GraftBridge, SortedLongJaccard}
    GraftBridge.column(SortedLongJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** SimHash near-dup pairs: 64-bit sketch, banded into `bands` chunks
    * (pigeonhole: pairs within Hamming distance bands-1 share >= 1 exact
    * band), verified with bit_count(xor) <= maxHamming.
    *
    * Join-free: the sketch is one long, so it rides inside the bucket
    * group — one shuffle total, singleton buckets pruned before the
    * quadratic pair stage, sketch computed exactly once per doc.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bands: Int = 4, maxBucket: Int = 4096,
                   capObs: Option[Observation] = None,
                   keyBands: Int = 1): DataFrame =
    // r17 fanned this out unconditionally and the driver measured a 2×
    // REGRESSION at the benched SF (VERDICT r17 #1): simhashText is one
    // tokenize+hash pass — cheap per byte — so 32 near-empty tasks plus
    // the exchange cost more than the serial kernel. r18: cost-gated at
    // one task per MB of text; tiny inputs skip the exchange entirely,
    // an under-split 100 TB source still reaches every core.
    bandedHammingPairs(
      Ops.fanOutForCompute(
          df.select(col(idCol).as("__id"), col(textCol).as("__t")),
          1024 * 1024L, col("__id"))
        .select(col("__id"), SimHash.simhashText(col("__t")).as("__sh")),
      maxHamming, bands, maxBucket, capObs, keyBands)

  /** Perceptual-hash image near-dup pairs (round 14): dHash64 over the
    * raster blobs ([[graft.functions.PHashKernels]] — recompressions
    * and small edits land within a few bits), then the SAME banded
    * Hamming machinery as [[simhashPairs]]: pigeonhole bands as the
    * candidate buckets, exact bit_count verification, bounded buckets
    * with observable drops. Undecodable blobs (codec formats, tiny or
    * malformed images) hash NULL and simply produce no pairs — the
    * triage tier reports them, this operator never guesses. */
  def imageNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBucket: Int = 4096,
                        capObs: Option[Observation] = None,
                        keyBands: Int = 1): DataFrame = {
    require(bands > maxHamming, // this operator's contract is EXACT recall
      s"imageNearDupPairs pigeonhole needs bands > maxHamming, " +
        s"got $bands <= $maxHamming")
    import org.apache.spark.sql.{DHash64, GraftBridge}
    val h = GraftBridge.column(DHash64(GraftBridge.expression(col(bytesCol))))
    // null sketches are absorbed inside bandedHammingPairs (r17 opt:
    // a filter here was predicate-pushed below the sketch Project and
    // re-evaluated the whole decode kernel — guide §4.4)
    bandedHammingPairs(
      df.select(col(idCol).as("__id"), h.as("__sh")),
      maxHamming, bands, maxBucket, capObs, keyBands)
  }

  /** Audio perceptual near-dup pairs (round 16): the image banding
    * pattern applied to decoded PCM — [[org.apache.spark.sql.AudioDhash64]]
    * (temporal energy-envelope fingerprint over WAV/G.711/ADPCM/AU/
    * AIFF/FLAC samples, integer-exact) sketches each blob to 64 bits,
    * then the SAME banded Hamming machinery as [[imageNearDupPairs]]:
    * pigeonhole bands, exact bit_count verification, bounded buckets
    * with observable drops, Manku-style keyBands subsets. Undecodable
    * or sub-65-sample blobs hash NULL and produce no pairs. */
  def audioNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBucket: Int = 4096,
                        capObs: Option[Observation] = None,
                        keyBands: Int = 1): DataFrame = {
    require(bands > maxHamming, // EXACT recall is this operator's contract
      s"audioNearDupPairs pigeonhole needs bands > maxHamming, " +
        s"got $bands <= $maxHamming")
    import org.apache.spark.sql.{AudioDhash64, GraftBridge}
    val h = GraftBridge.column(AudioDhash64(GraftBridge.expression(col(bytesCol))))
    // null sketches are absorbed inside bandedHammingPairs (r17 opt:
    // a filter here was predicate-pushed below the sketch Project and
    // re-evaluated the whole decode kernel — guide §4.4)
    bandedHammingPairs(
      df.select(col(idCol).as("__id"), h.as("__sh")),
      maxHamming, bands, maxBucket, capObs, keyBands)
  }

  /** Video near-dup pairs (round 16): [[audioNearDupPairs]]'s frame
    * twin — [[org.apache.spark.sql.VideoDhash64]] (temporal
    * luma-envelope over decoded MJPEG-MP4 / animated-GIF frames,
    * integer-exact) sketches each blob, then the shared banded
    * Hamming machinery. Frames never enter an exchange — the
    * fingerprint collapses each video to 8 bytes inside the scan
    * projection. */
  def videoNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBucket: Int = 4096,
                        capObs: Option[Observation] = None,
                        keyBands: Int = 1): DataFrame = {
    require(bands > maxHamming, // EXACT recall is this operator's contract
      s"videoNearDupPairs pigeonhole needs bands > maxHamming, " +
        s"got $bands <= $maxHamming")
    import org.apache.spark.sql.{GraftBridge, VideoDhash64}
    val h = GraftBridge.column(VideoDhash64(GraftBridge.expression(col(bytesCol))))
    // null sketches are absorbed inside bandedHammingPairs (r17 opt:
    // a filter here was predicate-pushed below the sketch Project and
    // re-evaluated the whole decode kernel — guide §4.4)
    bandedHammingPairs(
      df.select(col(idCol).as("__id"), h.as("__sh")),
      maxHamming, bands, maxBucket, capObs, keyBands)
  }

  /** The shared banded-Hamming candidate/verify core over a sketched
    * frame (__id, __sh: 64-bit signature). Pigeonhole: a pair within
    * `maxHamming` bits differs in at most maxHamming bands, so with
    * bands > maxHamming it collides in at least one band — callers
    * pick (bands, maxHamming) accordingly (4/3 for simhash text,
    * 8/6 for image dHash).
    *
    * `keyBands` (round 15, the Manku-style generalization): bucket
    * keys drawn from keyBands-SUBSETS of the bands. A pair within
    * maxHamming bits agrees on ≥ bands−maxHamming bands, so any
    * keyBands ≤ bands−maxHamming keeps recall EXACT while widening
    * the key from 64/bands to keyBands·64/bands bits — the candidate
    * volume term drops from ~bands·n²/2^(64/b) to
    * ~C(bands,keyBands)·n²/2^(k·64/b). With 8 bands / maxHamming 6,
    * keyBands=2 gives 28 tables of 16-bit keys: 73× fewer accidental
    * candidates, the difference between a ~10M-image regime and a
    * ~1B-image one (PhashScale measures both). */
  /** All keyBands-subsets of band indices, in lexicographic order —
    * shared by the pair ops and the persisted index so keys align. */
  private[operators] def bandSubsets(bands: Int, keyBands: Int): Seq[Seq[Int]] =
    (0 until bands).combinations(keyBands).map(_.toSeq).toSeq

  private def subsetKeys(sh: Column, bands: Int,
                         keyBands: Int): Seq[Column] = {
    val chunk = 64 / bands
    def chunkOf(b: Int): Column =
      shiftright(sh, b * chunk).bitwiseAND(lit((1L << chunk) - 1))
    bandSubsets(bands, keyBands).map { sub =>
      sub.zipWithIndex.map { case (b, k) =>
        shiftleft(chunkOf(b), k * chunk): Column
      }.reduce(_.bitwiseOR(_))
    }
  }

  private def requireKeyBands(bands: Int, maxHamming: Int,
                              keyBands: Int): Unit = {
    require(keyBands >= 1 && keyBands * (64 / bands) <= 63,
      s"keyBands=$keyBands keys exceed 63 bits at bands=$bands")
    val tables = bandSubsets(bands, keyBands).size
    require(tables <= 64,
      s"keyBands=$keyBands over $bands bands is $tables tables — cap 64")
    // bands - maxHamming >= keyBands makes the pigeonhole argument
    // EXACT; below that is the documented approximate regime (recall
    // measured by the callers' gates) — only meaningful for keyBands=1
    if (keyBands > 1) require(bands - maxHamming >= keyBands,
      s"keyBands=$keyBands needs bands - maxHamming >= $keyBands, " +
        s"got bands=$bands maxHamming=$maxHamming")
  }

  private def bandedHammingPairs(sketched: DataFrame,
                                 maxHamming: Int, bands: Int, maxBucket: Int,
                                 capObs: Option[Observation],
                                 keyBands: Int = 1): DataFrame = {
    require(bands >= 2 && bands <= 32 && 64 % bands == 0,
      s"bands must divide 64 and be in [2, 32], got $bands")
    requireKeyBands(bands, maxHamming, keyBands)
    val keys: Seq[Column] = subsetKeys(col("__sh"), bands, keyBands)

    // NULL sketches are dropped by the null-absorbing explode (a null
    // array emits zero rows) instead of a `.filter(__sh.isNotNull)` —
    // r17 opt: Catalyst pushes a deterministic filter on a computed
    // column below the fan-out exchange AND below the sketch Project,
    // so the filter form evaluated the whole decode+hash kernel TWICE
    // per row (guide §4.4's duplicated-evaluation trap, measured: the
    // pushed filter ran the full serial decode pre-exchange). The
    // `when` form keeps exactly the same pair semantics: a null
    // sketch enters no bucket, so it appears in no pair.
    val banded = sketched.select(
      struct(col("__id").as("id"), col("__sh").as("sh")).as("__m"),
      posexplode(when(col("__sh").isNotNull, array(keys: _*)))
        .as(Seq("__band", "__bandkey")))

    // same bounded-buffer cap + observable drop count as minhashLsh
    val buckets = banded
      .groupBy("__band", "__bandkey")
      .agg(collectSmallest(col("__m"), maxBucket).as("__ms"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    val observed = capObs.fold(buckets)(o => buckets.observe(o,
      sum(greatest(col("__n") - size(col("__ms")), lit(0L))).as("dropped_members"),
      count(when(col("__n") > size(col("__ms")), 1)).as("capped_buckets")))
    observed
      .select(explode(flatten(transform(col("__ms"), (x, i) =>
        transform(slice(col("__ms"), i + 2, size(col("__ms"))),
          y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            x.getField("sh").as("sh_a"), y.getField("sh").as("sh_b")))))).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"),
        col("__p.sh_a").as("__sh_a"), col("__p.sh_b").as("__sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("__sh_a").bitwiseXOR(col("__sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** EXACT all-pairs SimHash reference: every (id_a < id_b) pair within
    * `maxHamming` bits, found by brute force — the ground truth
    * [[simhashPairs]] is gated against. Pigeonhole makes the banded
    * output provably complete for `maxHamming <= bands - 1`, so the two
    * must agree EXACTLY there (recall 1.0, asserted by the query gate).
    * O(n²) sketch compares (one long each, no payloads): the validation
    * -scale reference — at corpus scale gate on a sampled subset.
    */
  def simhashPairsExact(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val src = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
    def sk(d: DataFrame) = d.select(col("__id"),
      SimHash.simhashText(col("__t")).as("__sh"))
    // r17 opt: the broadcast nested-loop probe runs in the STREAMED
    // side's tasks — fan that side out so the O(n²) sketch compares
    // use every core (no-op at real scan parallelism; guide §2.5).
    // r18: cost-gated — quadratic in rows, so a modest 64 KB/task
    // keeps real parallelism while tiny inputs skip the exchange.
    val a = sk(Ops.fanOutForCompute(src, 64 * 1024L, col("__id")))
      .select(col("__id").as("id_a"), col("__sh").as("__sha"))
    val b = sk(src).select(col("__id").as("id_b"), col("__sh").as("__shb"))
    // hamming bound INSIDE the nested-loop condition: candidate pairs
    // are filtered as they stream, never materialized
    a.join(broadcast(b), col("id_a") < col("id_b") &&
        bit_count(col("__sha").bitwiseXOR(col("__shb"))) <= maxHamming)
      .withColumn("hamming", bit_count(col("__sha").bitwiseXOR(col("__shb"))))
      .select("id_a", "id_b", "hamming")
  }

  /** EXACT all-pairs embedding near-dup reference: every (id_a < id_b)
    * pair with cosine >= threshold by brute force — the ground truth
    * [[embeddingNearDup]]'s LSH-bucketed output is gated against.
    * O(n²) dot products, so the audit cost at corpus scale is governed
    * by `truthSampleOneIn`: only rows with `idCol % truthSampleOneIn
    * == 0` enter the truth side, cutting pair compares by its SQUARE
    * (one-in-10 → 1% of the compares) while the recall measured on the
    * surviving deterministic pair subfamily still estimates overall
    * recall — the sample is an id-modulus, independent of the
    * operator-under-test's bucketing. The default 1 is the full
    * validation-scale truth; a 100 TB run DECLARES its audit budget
    * here instead of hand-editing a filter.
    */
  def embeddingNearDupExact(df: DataFrame, vecCol: String, idCol: String,
                            threshold: Double = 0.95,
                            truthSampleOneIn: Int = 1): DataFrame = {
    require(truthSampleOneIn >= 1, s"bad truthSampleOneIn $truthSampleOneIn")
    val sampled =
      if (truthSampleOneIn == 1) df
      else df.filter(pmod(col(idCol), lit(truthSampleOneIn)) === 0)
    val src = sampled.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__raw"))
    def unit(d: DataFrame) = d.select(col("__id"),
      VectorFunctions.l2Normalize(col("__raw")).as("__v"))
    // r17 opt: the O(n²) dot products run in the streamed side's tasks
    // — fan that side out (no-op at real scan parallelism; guide §2.5).
    // r18: cost-gated at 64 KB/task (quadratic work per streamed row).
    val a = unit(Ops.fanOutForCompute(src, 64 * 1024L, col("__id")))
      .select(col("__id").as("id_a"), col("__v").as("__va"))
    val b = unit(src).select(col("__id").as("id_b"), col("__v").as("__vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.dot(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact pairwise n-gram Jaccard within caller-provided blocks (e.g.
    * per source, per language) — the verification primitive; blocks keep
    * the quadratic stage bounded. Shingle sets travel as sorted 64-bit
    * hash arrays and each pair is scored by one linear merge (equal to
    * string-set Jaccard up to 64-bit collisions).
    *
    * `minJaccard` enables the set-similarity LENGTH FILTER (the PPJoin
    * family's cheapest bound): J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|),
    * so a pair whose set sizes differ by more than the threshold ratio
    * is discarded by two int compares BEFORE the O(|A|+|B|) merge, and
    * only surviving pairs are scored and post-filtered. The returned
    * pair set is exactly the ≥ minJaccard pairs — the bound is implied,
    * never lossy.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, n: Int = 3,
                        minJaccard: Double = 0.0): DataFrame = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0, s"bad minJaccard $minJaccard")
    val src = df.select(
      col(blockCol).as("__blk"), col(idCol).as("__id"), col(textCol).as("__t"))
    def g(d: DataFrame) = d.select(col("__blk"), col("__id"),
      TextFunctions.shingleHashes(col("__t"), n).as("__sh"))
    // r17 opt: the quadratic per-block merge runs in the join stage,
    // i.e. in the streamed side's tasks — fan that side out so an
    // under-split source does not serialize the whole pair stage on
    // one core (no-op at real scan parallelism; guide §2.5). r18:
    // cost-gated at 16 KB/task — the per-row work is a whole block's
    // worth of linear merges, far above the per-byte sketch kernels.
    val a = g(Ops.fanOutForCompute(src, 16 * 1024L, col("__id")))
      .select(col("__blk"), col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val b = g(src)
      .select(col("__blk"), col("__id").as("id_b"), col("__sh").as("__sh_b"))
    val joined = a.join(b, Seq("__blk")).filter(col("id_a") < col("id_b"))
    // 1e-6 slack: the post-filter compares the ROUNDED (6-decimal)
    // score, so a pair rounding up across the threshold must not be
    // length-filtered on its unrounded bound
    val bound = math.max(0.0, minJaccard - 1e-6)
    val prefiltered =
      if (minJaccard <= 0.0) joined
      else joined.filter(
        size(col("__sh_a")).cast("double") >= lit(bound) * size(col("__sh_b")) &&
          size(col("__sh_b")).cast("double") >= lit(bound) * size(col("__sh_a")))
    val scored = prefiltered.select(col("id_a"), col("id_b"),
      round(sortedJaccard(col("__sh_a"), col("__sh_b")), 6).as("jaccard"))
    if (minJaccard <= 0.0) scored else scored.filter(col("jaccard") >= minJaccard)
  }

  /** Connected components over a near-dup pair graph: every node gets
    * the minimum id reachable from it as its `cluster` label — the step
    * that turns pairwise candidates into dedup groups. Only ids that
    * appear in `pairs` are returned (unpaired docs are their own
    * implicit cluster — see [[dedupByPairs]] for the apply side).
    *
    * Algorithm: iterative min-label propagation with pointer jumping —
    * each round every node takes the smallest label among itself and
    * its neighbors (one join + partial-min aggregate), then follows its
    * label's label (path halving). The jump makes long chains converge
    * in O(log diameter) rounds instead of O(diameter); near-dup
    * clusters are near-cliques, so real corpora converge in 2-3 rounds.
    * Each round is a fixed number of key-partitioned joins — no driver
    * materialization of the graph. Refuses (throws) rather than return
    * a partially-converged labeling if `maxIters` is exhausted.
    *
    * Small-graph fast path: the distinct pair graph is usually TINY
    * relative to the corpus (it is the post-threshold near-dup edge
    * set, not the documents), but every distributed round still costs
    * several scheduled shuffles. When the edge count is at most
    * `localEdgeLimit` and the ids are integral, the components are
    * solved in one driver-side union-find over the collected edges —
    * the same bounded-materialization bet a broadcast join makes
    * (default 4M edges ≈ 128 MB of specialized long-pair tuples on the
    * driver, transiently), with identical min-label output.
    * `localEdgeLimit = 0` forces the distributed loop.
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                  maxIters: Int = 25, localEdgeLimit: Long = 4_000_000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // ONE setup shuffle on b (r18, the prepareEdges trick): the
    // distinct's Aggregate(a, b) needs only co-location on a SUBSET of
    // its keys, so the explicit HashPartitioning(b) satisfies it with
    // no second exchange — and every ROUND's neighbor join (keyed on b)
    // then reuses the cache's recorded partitioning instead of
    // re-shuffling the edge frame once per round, which is what the
    // r17 shape paid (the biggest frame in the loop moving every
    // iteration; guide §2.4 "two operations keyed the same way can
    // share one exchange").
    val sym = pairs.select(col(idA).as("a"), col(idB).as("b"))
      .unionByName(pairs.select(col(idB).as("a"), col(idA).as("b")))
      .repartition(col("b"))
      .distinct()
    sym.persist(StorageLevel.MEMORY_AND_DISK)
    val integralIds = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(sym.schema("a").dataType)
    // sym carries BOTH orientations of every undirected edge (self-loops
    // once), so the budget comparison is against 2× the documented limit
    if (integralIds && localEdgeLimit > 0 && sym.count() <= 2 * localEdgeLimit)
      try localComponents(sym) finally sym.unpersist(blocking = false)
    else try {
      // localCheckpoint (eager) after every round: the pointer-jump
      // self-join puts TWO copies of the previous round's plan under the
      // new one, so without lineage truncation the logical plan — and
      // Catalyst's re-analysis of it — grows EXPONENTIALLY with rounds
      // (measured: round 4 spent 27 s planning a 4-round lineage at
      // sf0.1). Checkpointing caps every round at a constant-size plan.
      // Superseded rounds are released explicitly once the next round
      // materializes (GraftBridge.unpersistCheckpoint — round 9; before
      // that they waited on the nondeterministic ContextCleaner); on a
      // real cluster prefer reliable `checkpoint()` — localCheckpoint
      // state also dies with an executor.
      // post-round label-state width, derived from the MEASURED edge
      // count (the count also pre-materializes the sym cache, so round
      // 1 no longer pays the pair-graph compute inside its own timing):
      // the label frame is one row per node (≤ |sym|), ~16 B each —
      // coalescing the tiny state to few partitions stops every round
      // paying full 32-task waves over near-empty partitions, while a
      // real graph keeps every shuffle partition (scale-adaptive, the
      // same rule as Graph.pageRank's round coalesce; narrow, never a
      // shuffle).
      val parts = math.min(
        sym.sparkSession.conf.get("spark.sql.shuffle.partitions").toLong,
        math.max(1L, sym.count() / 524288L + 1L)).toInt
      // FUSED init + first neighbor-min round (r18): with identity
      // initial labels, round 1's neighbor-min is just
      // least(a, min(b)) — one aggregation over the edge frame, no
      // label join — and the pointer jump over an identity label table
      // is the identity, so the whole first round (distinct + two
      // joins + jump) collapses into the init aggregation. The state
      // entering round 2 is bit-identical to the unfused loop's.
      // NULL ids drop here explicitly (the unfused shape dropped them
      // via the jump's inner join); a node whose only partner is NULL
      // still registers as its own cluster (min over no non-null
      // neighbors is NULL, coalesced back to the id below)
      val round1 = sym.filter(col("a").isNotNull)
        .groupBy(col("a"))
        .agg(min(col("b")).as("__nbr"))
        .select(col("a").as("id"),
          least(col("a"), coalesce(col("__nbr"), col("a"))).as("label"),
          col("a").as("__prev"))
        .coalesce(parts)
        .localCheckpoint(false)
      val changed1 = round1.filter(col("label") =!= col("__prev")).count()
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(s"[dupClusters] round 1 (fused init): $changed1 labels changed")
      // labels keeps round1's (id, label, __prev) checkpoint frame
      // directly so unpersistCheckpoint sees the LogicalRDD; __prev is
      // simply never read again
      var labels = round1
      var iter = 1
      var done = changed1 == 0
      while (!done) {
        val roundT0 = System.nanoTime()
        if (iter >= maxIters) throw new IllegalStateException(
          s"dupClusters did not converge in $maxIters rounds — " +
            "pathological graph diameter; raise maxIters")
        // 1) neighbor-min: smallest label among self + neighbors. The
        // round's ORIGINAL label rides along as __prev so convergence is
        // a column compare at the end — not another labels⋈jumped join
        // (which would shuffle both sides on id again)
        val viaNbr = sym
          .join(labels.select(col("id").as("b"), col("label").as("__nl")), Seq("b"))
          .groupBy(col("a").as("id")).agg(min(col("__nl")).as("__nbr"))
        val pulled = labels.join(viaNbr, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("__nbr"), col("label"))).as("label"),
            col("label").as("__prev"))
        // 2) pointer jump (path halving): label := label's label. The
        // lookup side is the ROUND-START label table (the materialized
        // checkpoint), not `pulled` — r18: a self-join on `pulled`
        // duplicated its whole subtree (the sym join + neighbor-min
        // aggregate ran TWICE per round; StageProbe-measured as the
        // two dominant 32-task stages), because the two differently-
        // projected references defeat exchange reuse. Stale-table
        // jumping is the classic Shiloach–Vishkin shape: every label
        // VALUE is a graph id (induction from label=id at init), so
        // the inner join target still always exists, labels still only
        // ever decrease, and the fixpoint — neighbor-min stable under
        // a symmetric edge set ⇒ labels constant per component ⇒ equal
        // to the component min — is unchanged; only the round count at
        // which it is reached can differ, never the converged output.
        val jumped = pulled
          .join(labels.select(col("id").as("__jid"), col("label").as("__jl")),
            col("label") === col("__jid"))
          .select(col("id"), col("__jl").as("label"), col("__prev"))
          .coalesce(parts)
          // lazy: the changed-count below materializes the checkpoint in
          // the same job instead of spending a separate eager action
          .localCheckpoint(false)
        val changed = jumped.filter(col("label") =!= col("__prev")).count()
        if (sys.env.contains("GRAFT_DEBUG_CC"))
          System.err.println(s"[dupClusters] round ${iter + 1}: $changed labels changed " +
            s"(${(System.nanoTime() - roundT0) / 1e9}s)")
        // jumped is materialized by the count above — the previous
        // round's checkpoint is now unreferenced and safe to release
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(labels)
        labels = jumped
        done = changed == 0
        iter += 1
      }
      labels.select(col("id"), col("label").as("cluster"))
    } finally sym.unpersist(blocking = false)
  }

  /** Driver-side union-find over a bounded, collected edge set — the
    * [[dupClusters]] fast path. Semantics mirror the distributed loop
    * exactly: cluster = min id in the component; ids only ever paired
    * with NULL still appear (as their own cluster); NULL ids themselves
    * are dropped (equi-joins never match them). Union-by-min keeps each
    * tree's root at the component minimum, so the final `find` IS the
    * label.
    */
  private def localComponents(sym: DataFrame): DataFrame = {
    val idType = sym.schema("a").dataType
    val spark = sym.sparkSession
    import spark.implicits._
    // sym carries both orders of every pair; keep each undirected edge
    // once. ONE collect, as a SPECIALIZED primitive dataset — ~32 bytes
    // per edge instead of 100+ for boxed GenericRows, so the 4M-edge
    // default transiently holds ~128 MB of driver heap, not several
    // hundred. Null-neighbor rows ((x, NULL): x must still register as
    // a node) become SELF-edges via coalesce — a self-edge registers x
    // and unions nothing, so no in-band sentinel is needed (any
    // sentinel value is a legitimate id to some caller; this codebase
    // derives ids from 64-bit hashes) and no second collect job runs.
    val edges = sym.filter(col("a").isNotNull &&
        (col("b").isNull || col("a") <= col("b")))
      .select(col("a").cast("long"),
        coalesce(col("b"), col("a")).cast("long"))
      .as[(Long, Long)]
      .collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def add(x: Long): Unit = if (!parent.contains(x)) parent(x) = x
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    edges.foreach { case (a, b) =>
      add(a); add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toArray.map(id => (id, find(id)))
    spark.createDataset(out.toSeq).toDF("id", "cluster")
      .select(col("id").cast(idType).as("id"),
        col("cluster").cast(idType).as("cluster"))
  }

  /** Corpus-level line deduplication (the CCNet-style boilerplate
    * remover): every distinct line is kept only at its FIRST corpus
    * occurrence — ordered by (doc id, line position) — and removed
    * everywhere else. Lines shorter than `minChars` are exempt (always
    * kept), so empty/separator lines don't all collapse into whichever
    * document sorts first. Documents are rebuilt from their surviving
    * lines in original order; a document whose every line was removed
    * disappears (NULL text never splits, so those rows disappear too).
    * Returns (doc_id, text, n_kept, n_dropped).
    *
    * Scale shape: the first-occurrence winner per line is
    * `min(struct(doc, pos))` in a hash aggregate KEYED BY THE LINE —
    * partial aggregation collapses duplicate lines map-side, so the
    * shuffle carries one row per distinct line and a mega-duplicated
    * boilerplate line costs one combiner cell per map task, not a
    * skewed window reducer. The rebuild groupBy holds one document's
    * lines at a time.
    */
  def lineDedup(docs: DataFrame, textCol: String, idCol: String,
                delim: String = "\n", minChars: Int = 1): DataFrame = {
    require(minChars >= 0, s"minChars must be >= 0, got $minChars")
    val exploded = docs
      .select(col(idCol).as("doc_id"),
        split(col(textCol), java.util.regex.Pattern.quote(delim)).as("__ls"))
      .select(col("doc_id"), size(col("__ls")).as("__n_lines"),
        posexplode(col("__ls")).as(Seq("__pos", "__line")))
    val subject = exploded.filter(length(col("__line")) >= minChars)
    // (doc_id, __pos) is unique, so __n_lines never participates in the
    // struct ordering — it just rides along to the winner row
    val winners = subject.groupBy(col("__line"))
      .agg(min(struct(col("doc_id"), col("__pos"), col("__n_lines"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.__pos").as("__pos"),
        col("__w.__n_lines").as("__n_lines"), col("__line"))
    val exempt = exploded.filter(length(col("__line")) < minChars)
      .select("doc_id", "__pos", "__n_lines", "__line")
    winners.unionByName(exempt)
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), delim).as("text"),
        count(lit(1)).cast("long").as("n_kept"),
        (max(col("__n_lines")) - count(lit(1))).cast("long").as("n_dropped"))
  }

  /** Cross-document duplicated-SPAN coverage — the third dedup
    * granularity next to document-level [[exact]] and line-level
    * [[lineDedup]]: for every document, how many of its distinct word
    * n-grams also occur in at least `minDocs - 1` OTHER documents, and
    * the fraction of the document that coverage represents. This is the
    * per-document signal span-level training-data dedup (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better")
    * computes from a suffix array, re-expressed in the gram-hash form
    * that IS a two-shuffle Spark plan (a distributed suffix array buys
    * longer maximal matches, not a different per-doc coverage signal,
    * and has no shuffle-lean formulation).
    *
    * Scale shape: grams explode map-side and collapse to a 64-bit
    * xxhash immediately, so both exchanges — the per-gram
    * document-frequency aggregate and the duplicate-flag join back onto
    * (doc, gramHash) — carry ~16-byte rows, never gram text. The
    * distinct-per-doc gram kernel ([[TextFunctions.wordNgrams]]) bounds
    * any one gram's rows by the corpus doc count. A genuinely hot
    * boilerplate gram is a skew key of narrow rows in the dup-flag
    * join's probe side, and — measured, SCALING.md "Span dedup under
    * boilerplate skew" — AQE's skew-join split can NEVER rescue it
    * here: the dup-gram aggregate is already partitioned on `__gh`, so
    * EnsureRequirements elides its exchange, the final HashAggregate
    * fuses into the join stage, and OptimizeSkewedJoin (which matches
    * only ENSURE_REQUIREMENTS ShuffleQueryStage children on BOTH
    * sides) never fires; re-exchanging the dup side by hand doesn't
    * help either, because a user repartition carries the
    * REPARTITION_BY_COL origin the matcher also rejects. Skew
    * mitigation must therefore be explicit: `saltBuckets > 1` routes
    * the dup-flag join through [[Ops.saltedJoin]], spreading each hot
    * gram's probe rows over `saltBuckets` reducers at the cost of
    * replicating the (already df-filtered) dup-gram table that many
    * times — the right trade exactly in the forced sort-merge regime
    * where the dup-gram set is too big to broadcast, which is the same
    * regime where the skew exists at all.
    * Hash collisions conflate grams at the usual 2^-64 pair rate — the
    * same contract every fingerprint-keyed dedup here accepts.
    *
    * Documents with fewer than n tokens carry no grams and are absent
    * from the output (callers wanting them back left-join on the id).
    *
    * @return (doc_id, n_grams, n_dup_grams, dup_frac) per document
    */
  def spanDuplication(docs: DataFrame, textCol: String, idCol: String,
                      n: Int, minDocs: Int = 2,
                      saltBuckets: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordNgrams(col(textCol), n)).as("__g"))
      .select(col("doc_id"), xxhash64(col("__g")).as("__gh"))
    // wordNgrams is distinct-per-doc, so count(*) IS document frequency
    val dupGrams = grams.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__gh"), lit(1).as("__dup"))
    val flagged =
      if (saltBuckets > 1)
        Ops.saltedJoin(grams, dupGrams, Seq("__gh"), saltBuckets, "left")
      else grams.join(dupGrams, Seq("__gh"), "left")
    flagged
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        count(col("__dup")).cast("long").as("n_dup_grams"))
      .withColumn("dup_frac",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
  }

  /** Apply a pair graph as a dedup: keep the minimum-id representative
    * of every near-dup cluster plus all unpaired rows. The anti-join
    * side is only the NON-representatives — ids never in `pairs` pass
    * through untouched.
    */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = dupClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates from
    * random-hyperplane LSH buckets (see
    * [[graft.functions.VectorFunctions.cosineLshBucket]]).
    *
    * `bands` independent hash tables OR-amplify recall: a pair is a
    * candidate if it collides in ANY band (recall = 1-(1-p^nBits)^bands
    * for per-hyperplane agreement probability p = 1 - angle/pi), at
    * `bands`× the bucketing and join cost. bands=1 keeps the
    * single-table plan with no cross-band dedup shuffle.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double = 0.95, lshBits: Int = 8,
                       bands: Int = 1): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val unit = df.select(col(idCol).as("__id"),
      VectorFunctions.l2Normalize(col(vecCol)).as("__v"))
    val v =
      if (bands == 1)
        unit.withColumn("__band", lit(0))
          .withColumn("__bkt", VectorFunctions.cosineLshBucket(col("__v"), lshBits))
      else
        unit.select(col("__id"), col("__v"),
          posexplode(array((0 until bands).map(b =>
            VectorFunctions.cosineLshBucket(col("__v"), lshBits, seed = 42L + b)): _*))
            .as(Seq("__band", "__bkt")))
    val a = v.select(col("__band"), col("__bkt"), col("__id").as("id_a"), col("__v").as("__va"))
    val b = v.select(col("__band"), col("__bkt"), col("__id").as("id_b"), col("__v").as("__vb"))
    val scored = a.join(b, Seq("__band", "__bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.dot(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    // the same pair can collide in several bands — dedup AFTER the
    // threshold filter, so the extra shuffle carries only surviving
    // near-dup pairs (3 narrow columns), not every candidate with two
    // embedding vectors attached; the duplicate dot products this
    // recomputes are codegen-cheap
    if (bands == 1) scored else scored.dropDuplicates("id_a", "id_b")
  }

  /** Fingerprint-index rows for [[incrementalExact]]: the distinct
    * normalized-content fingerprints of a corpus (or of an admitted
    * batch, when appending) — ONE long per distinct content, so a
    * trillion-document corpus indexes in single-digit terabytes of
    * parquet however many petabytes the text occupies. Persist with
    * [[graft.sources.Sinks.writeBucketed]] on `fp` so every subsequent
    * ingest reads it exchange-free.
    */
  def fingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs.select(TextFunctions.contentFingerprint(col(textCol)).as("fp"))
      .distinct()

  /** Incremental exact dedup — the ingestion-time form of [[exact]]: a
    * NEW batch row is admitted iff its normalized-content fingerprint
    * (a) has no row in the historical corpus index and (b) is the first
    * occurrence (lowest `idCol`) within the batch.
    *
    * [[exact]] re-scans the whole corpus per run; a continuously-fed
    * corpus instead carries its history as the [[fingerprints]] index
    * and pays per ingest only one hash-aggregate over the batch plus an
    * anti-join against the index. With the index bucketed on `fp` at
    * the session's shuffle parallelism, the batch's keep-first
    * aggregate and the anti-join share one exchange and the index side
    * never shuffles at all (DedupSpec asserts the single-exchange
    * plan) — the 100 TB contract: per-ingest shuffle volume is O(batch),
    * independent of corpus size.
    *
    * Admission is anti-join semantics, NOT `NOT IN`: a null fingerprint
    * (null text) never matches the index — even an index row with a
    * null `fp` — so null-text rows are always admitted (one per batch:
    * within the batch they form a single group, mirroring [[exact]]'s
    * GROUP BY contract; the DuckDB oracle mirrors this with
    * NOT EXISTS).
    *
    * @param historyFps index frame bearing an `fp` column
    *                   ([[fingerprints]] output, usually a bucketed
    *                   table read)
    * @return admitted rows (all `newDocs` columns) plus `fp`; feed
    *         `.select("fp")` back to the index append for the next run
    */
  def incrementalExact(newDocs: DataFrame, historyFps: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    require(historyFps.columns.contains("fp"),
      s"historyFps must carry an 'fp' column, has ${historyFps.columns.mkString(",")}")
    val cols = newDocs.columns.toSeq
    require(!cols.exists(_.equalsIgnoreCase("fp")),
      "newDocs must not already carry an 'fp' column")
    val firsts = newDocs
      .withColumn("__fp", TextFunctions.contentFingerprint(col(textCol)))
      .groupBy(col("__fp"))
      // min_by carries the whole winning row through the aggregate, so
      // keep-first costs the same one partial+final hash-agg as exact()
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
    firsts.join(historyFps.select(col("fp")),
        firsts("__fp") === col("fp"), "left_anti")
      .select(cols.map(c => col(s"__row.$c")) :+ col("__fp").as("fp"): _*)
  }

  /** MinHash index of a corpus — the near-dup twin of [[fingerprints]],
    * consumed by [[incrementalMinhash]]. Two frames, because they serve
    * two different joins:
    *
    *  - `bands` (doc_id, band, bandhash): ~24 B × bands per doc; the
    *    candidate join's build side. Persist bucketed on
    *    (band, bandhash).
    *  - `sigs` (doc_id, sig): numHashes longs per doc; the
    *    verification join's build side. Persist bucketed on doc_id.
    *
    * Folding the signature into every band row would multiply its
    * storage by `bands` and drag K longs through the candidate
    * shuffle — the split keeps each join's payload minimal. Total index
    * size is ~(24·bands + 8·numHashes) bytes/doc: a 100 TB corpus of
    * ~25 B docs indexes in ~6 TB at the defaults, and ingests never
    * touch corpus TEXT again.
    *
    * Docs with no shingle (shorter than the window, null text) are
    * excluded: an all-sentinel signature would declare every pair of
    * empty docs a perfect near-dup, where the exact kernel scores
    * empty∩empty as 0 ([[sortedJaccard]] union=0 → 0.0).
    *
    * The banding construction is [[bandHashes]], shared with
    * [[minhashLsh]] — an index built by one collides correctly with
    * batches banded by the other.
    */
  def minhashIndex(docs: DataFrame, textCol: String, idCol: String,
                   shingleSize: Int = 5, numHashes: Int = 16,
                   bands: Int = 4): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // the index is only meaningful under the exact (shingleSize,
    // numHashes, bands) it was built with — stamp them as column
    // metadata (survives a parquet round-trip in the Spark schema
    // footer) so a later ingest with different parameters fails loudly
    // in incrementalMinhash instead of silently never colliding
    val meta = new MetadataBuilder()
      .putLong(MetaShingleSize, shingleSize.toLong)
      .putLong(MetaNumHashes, numHashes.toLong)
      .putLong(MetaBands, bands.toLong)
      .build()
    val sigs = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.shingleHashes(col(textCol), shingleSize).as("__hs"))
      .filter(size(col("__hs")) > 0)
      .select(col("doc_id"),
        minhashSignature(col("__hs"), numHashes).as("sig", meta))
    val banded = sigs.select(col("doc_id"),
      posexplode(bandHashes(col("sig"), bands, r)).as(Seq("band", "bandhash")))
      .select(col("doc_id"), col("band"), col("bandhash").as("bandhash", meta))
    (banded, sigs)
  }

  private val MetaShingleSize = "graft.minhash.shingleSize"
  private val MetaNumHashes = "graft.minhash.numHashes"
  private val MetaBands = "graft.minhash.bands"

  /** Fail fast when an index frame carries [[minhashIndex]] build
    * metadata that disagrees with the parameters of the current call —
    * a mismatch would otherwise yield silently empty (different band
    * arity) or silently deflated (different signature length) results.
    * Frames without the metadata (hand-built indexes, lossy rewrites)
    * are let through; the in-plan signature-length guard still backstops
    * the numHashes case at execution time.
    */
  private def requireIndexParams(df: DataFrame, colName: String,
                                 shingleSize: Int, numHashes: Int,
                                 bands: Int): Unit =
    df.schema.fields.find(_.name == colName).foreach { f =>
      val m = f.metadata
      if (m.contains(MetaNumHashes)) {
        val got = (m.getLong(MetaShingleSize), m.getLong(MetaNumHashes),
          m.getLong(MetaBands))
        require(got == ((shingleSize.toLong, numHashes.toLong, bands.toLong)),
          s"incrementalMinhash: index column '$colName' was built with " +
            s"(shingleSize, numHashes, bands) = $got but this call uses " +
            s"(${shingleSize}, ${numHashes}, ${bands}) — rebuild the index " +
            "or match its parameters")
      }
    }

  /** Incremental near-dup detection — the ingestion-time form of
    * [[minhashLsh]]: new-batch documents are checked against the
    * historical corpus through its [[minhashIndex]], never through its
    * text. Candidates collide in any LSH band; each candidate pair is
    * scored by SIGNATURE AGREEMENT (fraction of equal minhash members —
    * an unbiased estimator of Jaccard with sd ≈ √(j(1-j)/K)), because
    * exact re-verification would require corpus shingles the index
    * deliberately does not store. At the default K=16 the estimate is
    * coarse (granularity 1/16) — callers screening at a tight threshold
    * should raise `numHashes` at index-build time; near-identical
    * duplicates (the overwhelming near-dup population in web corpora)
    * sit at agreement ≈ 1 regardless.
    *
    * Scale shape mirrors [[incrementalExact]]: per ingest the batch is
    * shingled/signed once; the candidate join shuffles (id, band, hash)
    * rows; with the index frames persisted bucketed (bands on
    * (band, bandhash), sigs on doc_id) neither corpus-scale side
    * re-exchanges. The batch side is capped at `maxBucket` members per
    * bucket inside the aggregation buffer (same bounded-buffer contract
    * as [[minhashLsh]], same reason: AQE cannot split a skewed bucketed
    * scan, so a mass-duplicated batch must be bounded explicitly);
    * candidate volume per bucket is then ≤ maxBucket × the bucket's
    * index rows.
    *
    * @return (new_id, hist_id, est_jaccard) with est_jaccard ≥
    *         `threshold`, rounded to 6 places
    */
  def incrementalMinhash(newDocs: DataFrame, indexBands: DataFrame,
                         indexSigs: DataFrame, textCol: String,
                         idCol: String, shingleSize: Int = 5,
                         numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.5,
                         maxBucket: Int = 4096,
                         capObs: Option[Observation] = None): DataFrame = {
    requireIndexParams(indexBands, "bandhash", shingleSize, numHashes, bands)
    requireIndexParams(indexSigs, "sig", shingleSize, numHashes, bands)
    val (batchBands, batchSigs) =
      minhashIndex(newDocs, textCol, idCol, shingleSize, numHashes, bands)
    val grouped = batchBands
      .groupBy(col("band"), col("bandhash"))
      .agg(collectSmallest(col("doc_id"), maxBucket).as("__ids"),
        count(lit(1)).as("__n"))
    // cap drops are observable, same contract as minhashLsh: recall lost
    // to a mass-duplicated ingest is a counted trade, not a silent one
    val observed = capObs.fold(grouped)(o => grouped.observe(o,
      sum(greatest(col("__n") - size(col("__ids")), lit(0L))).as("dropped_members"),
      count(when(col("__n") > size(col("__ids")), 1)).as("capped_buckets")))
    val cappedBatch = observed
      .select(col("band"), col("bandhash"), explode(col("__ids")).as("new_id"))
    val candidates = cappedBatch
      .join(indexBands.select(col("band"), col("bandhash"),
          col("doc_id").as("hist_id")),
        Seq("band", "bandhash"))
      .select("new_id", "hist_id")
      .dropDuplicates("new_id", "hist_id")
    candidates
      .join(batchSigs.select(col("doc_id").as("new_id"), col("sig").as("__sa")),
        Seq("new_id"))
      .join(indexSigs.select(col("doc_id").as("hist_id"), col("sig").as("__sb")),
        Seq("hist_id"))
      // execution-time backstop for indexes without build metadata: a
      // signature of the wrong length means the index was built with a
      // different numHashes — zip_with would null-pad and silently
      // deflate the estimate, so raise instead
      .withColumn("est_jaccard",
        when(size(col("__sb")) =!= numHashes,
          raise_error(concat(
            lit("incrementalMinhash: index signature length "),
            size(col("__sb")).cast("string"),
            lit(s" != numHashes=$numHashes — index built with different " +
              "parameters"))).cast("double"))
        .otherwise(round(
          aggregate(zip_with(col("__sa"), col("__sb"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes), 6)))
      .filter(col("est_jaccard") >= threshold)
      .select("new_id", "hist_id", "est_jaccard")
  }

  /** Incremental embedding near-dup — the ingestion-time form of
    * [[embeddingNearDup]], completing the incremental family beside
    * [[incrementalExact]] and [[incrementalMinhash]]: new-batch vectors
    * are screened against the historical corpus through its persisted
    * [[Similarity.buildIvfIndex]] ("$indexDir/lists" partitioned by
    * centroid, "$indexDir/centroids"), never through the raw corpus.
    * Per ingest the batch is normalized and centroid-assigned once; the
    * scan reads only the probed lists' files (partition pruning,
    * asserted in SimilaritySpec) — per-ingest IO is
    * ~nProbes/nCentroids of the index, independent of corpus text.
    * Recall follows the probe budget exactly; nProbes = nCentroids is
    * the exhaustive audit configuration.
    *
    * @return (new_id, hist_id, cosine) with cosine ≥ `threshold`,
    *         rounded to 6 places
    */
  def incrementalEmbedding(newDocs: DataFrame, indexDir: String,
                           vecCol: String, idCol: String,
                           threshold: Double = 0.9,
                           nProbes: Int = 2): DataFrame =
    Similarity.ivfRangeIndexed(newDocs.sparkSession, indexDir, newDocs,
        vecCol, idCol, threshold, nProbes)
      .select(col("query_id").as("new_id"),
        col("corpus_id").as("hist_id"), col("cosine"))

  /** [[incrementalEmbedding]] against a PRODUCT-QUANTIZED history index
    * ([[Similarity.buildIvfPqIndex]]) — round 13, closing the memory
    * objection on the 24/7 ingest story: the flat incremental index
    * stores dim·8 bytes of raw floats per historical vector in every
    * probed list, the PQ index stores M longs (64-d → 4 codes), so the
    * per-ingest candidate scan reads ~dim·8/M× fewer bytes and the
    * structure a deployment pins hot shrinks by the same factor. Raw
    * vectors are touched only for the ≤ rerank·|batch| ADC-shortlisted
    * rows (columnar pruning re-reads just the vector column of the
    * probed partitions for the broadcast refine). Recall follows the
    * probe budget AND the rerank depth; exhaustive probes with a
    * rerank covering the probed lists reproduce the exact threshold
    * join (the audit configuration q_incremental_embedding_pq runs
    * under its oracle, recall-gated like the flat path).
    *
    * @return (new_id, hist_id, cosine) with EXACT cosine ≥ `threshold`
    *         (the ADC approximation only selects the shortlist — scores
    *         in the output are always exact), rounded to 6 places
    */
  def incrementalEmbeddingPq(newDocs: DataFrame, indexDir: String,
                             vecCol: String, idCol: String,
                             threshold: Double = 0.9,
                             nProbes: Int = 2,
                             rerank: Int = 20): DataFrame =
    Similarity.ivfPqRangeIndexed(newDocs.sparkSession, indexDir, newDocs,
        vecCol, idCol, threshold, nProbes, rerank)
      .select(col("query_id").as("new_id"),
        col("corpus_id").as("hist_id"), col("cosine"))

  /** dHash sketch index of an image corpus — the PERCEPTUAL member of
    * the incremental family (round 15, VERDICT r14 #7), beside
    * [[fingerprints]]/[[minhashIndex]]/[[cdcFpIndex]]: one row per
    * (image, band) = (doc_id, hash, band, bandkey), ~28 B × bands per
    * decodable image, and ingests never touch corpus BLOBS again.
    * Persist PARTITIONED BY `band`: [[incrementalPhash]] probes only
    * maxHamming+1 bands, so each ingest's scan prunes to
    * (maxHamming+1)/bands of the index files. The banding construction
    * is [[bandedHammingPairs]]'s, so an index built here collides
    * correctly with batches banded there. Undecodable blobs (codec
    * damage, tiny images) hash NULL and are excluded — the triage tier
    * reports them, the index never guesses. `bands` is stamped as
    * column metadata so a mismatched ingest fails loudly.
    */
  def phashIndex(docs: DataFrame, bytesCol: String, idCol: String,
                 bands: Int = 8, keyBands: Int = 1): DataFrame = {
    require(bands >= 2 && bands <= 32 && 64 % bands == 0,
      s"bands must divide 64 and be in [2, 32], got $bands")
    require(keyBands >= 1 && keyBands * (64 / bands) <= 63,
      s"keyBands=$keyBands keys exceed 63 bits at bands=$bands")
    // same table-count cap the screen enforces — otherwise a build
    // could spend hours producing an index every ingest refuses
    // (r15 review); the maxHamming exactness bound is checked at
    // probe time (the index doesn't know the query threshold)
    require(bandSubsets(bands, keyBands).size <= 64,
      s"keyBands=$keyBands over $bands bands is " +
        s"${bandSubsets(bands, keyBands).size} tables — cap 64")
    val meta = new MetadataBuilder()
      .putLong(MetaPhashBands, bands.toLong)
      .putLong(MetaPhashKeyBands, keyBands.toLong).build()
    import org.apache.spark.sql.{DHash64, GraftBridge}
    val h = GraftBridge.column(DHash64(GraftBridge.expression(col(bytesCol))))
    sigIndexCore(docs, h, idCol, bands, keyBands, meta)
  }

  /** [[phashIndex]]'s audio twin (round 16): the persisted
    * band-partitioned fingerprint index over
    * [[org.apache.spark.sql.AudioDhash64]] energy envelopes — same
    * banding, same metadata stamp, same probe contract. */
  def audioFingerprintIndex(docs: DataFrame, bytesCol: String,
                            idCol: String, bands: Int = 8,
                            keyBands: Int = 1): DataFrame = {
    require(bands >= 2 && bands <= 32 && 64 % bands == 0,
      s"bands must divide 64 and be in [2, 32], got $bands")
    require(keyBands >= 1 && keyBands * (64 / bands) <= 63,
      s"keyBands=$keyBands keys exceed 63 bits at bands=$bands")
    require(bandSubsets(bands, keyBands).size <= 64,
      s"keyBands=$keyBands over $bands bands is " +
        s"${bandSubsets(bands, keyBands).size} tables — cap 64")
    val meta = new MetadataBuilder()
      .putLong(MetaPhashBands, bands.toLong)
      .putLong(MetaPhashKeyBands, keyBands.toLong).build()
    import org.apache.spark.sql.{AudioDhash64, GraftBridge}
    val h = GraftBridge.column(AudioDhash64(GraftBridge.expression(col(bytesCol))))
    sigIndexCore(docs, h, idCol, bands, keyBands, meta)
  }

  private def sigIndexCore(docs: DataFrame, h: Column, idCol: String,
                           bands: Int, keyBands: Int,
                           meta: org.apache.spark.sql.types.Metadata): DataFrame = {
    val keys: Seq[Column] = subsetKeys(col("__h"), bands, keyBands)
    // null-absorbing explode, not a filter — the filter form was
    // predicate-pushed below the hash Project and ran the decode
    // kernel twice per row (r17 opt, guide §4.4)
    docs.select(col(idCol).as("doc_id"), h.as("__h"))
      .select(col("doc_id"), col("__h"),
        posexplode(when(col("__h").isNotNull, array(keys: _*)))
          .as(Seq("band", "bandkey")))
      .select(col("doc_id"), col("__h").as("hash"), col("band"),
        col("bandkey").as("bandkey", meta))
  }

  private val MetaPhashBands = "graft.phash.bands"
  private val MetaPhashKeyBands = "graft.phash.keyBands"

  /** Ingestion-time perceptual near-dup screen — the image member of
    * the incremental family: new-batch images are checked against the
    * historical corpus through its persisted [[phashIndex]] at
    * `indexDir` (written `partitionBy("band")`), never through its
    * blobs.
    *
    * PARTIAL-PROBE pigeonhole: a (new, hist) pair within `maxHamming`
    * bits differs in at most maxHamming of the `bands` band keys, so
    * among ANY maxHamming+1 probed bands at least one must collide —
    * probing bands 0..maxHamming is EXACT (recall 1.0 vs brute force,
    * DedupSpec) while the band-partitioned scan reads only
    * (maxHamming+1)/bands of the index (partition pruning, pinned in
    * PlanSpec). Per ingest the batch is hashed once and shuffles
    * (id, 8-byte sketch, bandkey) rows — O(batch), blobs never enter
    * an exchange; the batch side is `maxBucket`-capped with observable
    * drops, the same bounded-buffer contract as [[incrementalMinhash]].
    *
    * @return (new_id, hist_id, hamming) with hamming ≤ `maxHamming`
    */
  def incrementalPhash(newDocs: DataFrame, indexDir: String,
                       bytesCol: String, idCol: String,
                       maxHamming: Int = 6, bands: Int = 8,
                       maxBucket: Int = 4096,
                       capObs: Option[Observation] = None,
                       keyBands: Int = 1): DataFrame = {
    import org.apache.spark.sql.{DHash64, GraftBridge}
    incrementalSig("incrementalPhash", newDocs, indexDir,
      GraftBridge.column(DHash64(GraftBridge.expression(col(bytesCol)))),
      idCol, maxHamming, bands, maxBucket, capObs, keyBands)
  }

  /** [[incrementalPhash]]'s audio twin (round 16): new-batch audio
    * blobs are fingerprinted ([[org.apache.spark.sql.AudioDhash64]])
    * and screened against a persisted [[audioFingerprintIndex]] with
    * the same partial-probe pigeonhole, partition pruning and bounded
    * buckets — blobs never enter an exchange, per-ingest shuffle is
    * O(batch). */
  def incrementalAudio(newDocs: DataFrame, indexDir: String,
                       bytesCol: String, idCol: String,
                       maxHamming: Int = 6, bands: Int = 8,
                       maxBucket: Int = 4096,
                       capObs: Option[Observation] = None,
                       keyBands: Int = 1): DataFrame = {
    import org.apache.spark.sql.{AudioDhash64, GraftBridge}
    incrementalSig("incrementalAudio", newDocs, indexDir,
      GraftBridge.column(AudioDhash64(GraftBridge.expression(col(bytesCol)))),
      idCol, maxHamming, bands, maxBucket, capObs, keyBands)
  }

  private def incrementalSig(what: String, newDocs: DataFrame,
                             indexDir: String, h: Column, idCol: String,
                             maxHamming: Int, bands: Int, maxBucket: Int,
                             capObs: Option[Observation],
                             keyBands: Int): DataFrame = {
    require(bands > maxHamming, // EXACT recall is this operator's contract
      s"$what pigeonhole needs bands > maxHamming, " +
        s"got $bands <= $maxHamming")
    requireKeyBands(bands, maxHamming, keyBands)
    val spark = newDocs.sparkSession
    val index = spark.read.parquet(indexDir)
    index.schema.fields.find(_.name == "bandkey").foreach { f =>
      if (f.metadata.contains(MetaPhashBands)) {
        val got = f.metadata.getLong(MetaPhashBands)
        val gotK = if (f.metadata.contains(MetaPhashKeyBands))
          f.metadata.getLong(MetaPhashKeyBands) else 1L
        require(got == bands.toLong && gotK == keyBands.toLong,
          s"$what: index at $indexDir was built with " +
            s"(bands=$got, keyBands=$gotK) but this call uses " +
            s"(bands=$bands, keyBands=$keyBands) — rebuild the index " +
            "or match its parameters")
      }
    }
    val chunk = 64 / bands
    // keyBands=1: the partial-probe pruning applies (any maxHamming+1
    // bands catch every pair). keyBands=2: the ≥2 agreeing bands can be
    // ANY of the C(bands,2) subsets, so every subset is probed — the
    // trade is 3.5x index rows and no pruning for ~73x fewer accidental
    // candidates (SCALING.md, PhashScale-measured).
    val probeBands = if (keyBands == 1) maxHamming + 1
      else bandSubsets(bands, keyBands).size
    val probeKeys: Seq[Column] =
      if (keyBands == 1)
        subsetKeys(col("__ha"), bands, 1).take(probeBands)
      else subsetKeys(col("__ha"), bands, keyBands)
    // null-absorbing explode, not a filter (r17 opt — see
    // bandedHammingPairs: the filter form re-ran the decode kernel)
    val batch = newDocs
      .select(col(idCol).as("__nid"), h.as("__ha"))
      .select(struct(col("__nid").as("id"), col("__ha").as("sh")).as("__m"),
        posexplode(when(col("__ha").isNotNull, array(probeKeys: _*)))
          .as(Seq("band", "bandkey")))
    val grouped = batch
      .groupBy(col("band"), col("bandkey"))
      .agg(collectSmallest(col("__m"), maxBucket).as("__ms"),
        count(lit(1)).as("__n"))
    val observed = capObs.fold(grouped)(o => grouped.observe(o,
      sum(greatest(col("__n") - size(col("__ms")), lit(0L))).as("dropped_members"),
      count(when(col("__n") > size(col("__ms")), 1)).as("capped_buckets")))
    observed
      .select(col("band"), col("bandkey"), explode(col("__ms")).as("__m"))
      // band < probeBands reaches the scan as a PARTITION filter: the
      // unprobed bands' files are never read
      .join(index.filter(col("band") < probeBands)
          .select(col("band"), col("bandkey"),
            col("doc_id").as("hist_id"), col("hash").as("__hb")),
        Seq("band", "bandkey"))
      .select(col("__m.id").as("new_id"), col("hist_id"),
        col("__m.sh").as("__ha"), col("__hb"))
      .dropDuplicates("new_id", "hist_id")
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("new_id", "hist_id", "hamming")
  }

  /** Content-defined chunks, one row per chunk: (id, chunk_idx,
    * chunk_start, chunk_len, chunk_fp) with `chunk_fp` = hex MD5 of the
    * chunk text. The SHIFT-RESILIENT granularity of the dedup family:
    * fixed windows misalign after any insertion, but CDC boundaries are
    * a pure function of the trailing `maskBits` code points
    * ([[graft.functions.CdcKernels]]), so two documents sharing a long
    * run of text share its interior chunk fingerprints no matter where
    * the run sits in either document — which is what lets a recrawl or
    * an edited near-copy be detected by one hash-join on `chunk_fp`
    * instead of a quadratic alignment.
    *
    * Scale shape: boundary detection + substring + md5 are one narrow
    * codegen pass per document — NO shuffle in this operator at all;
    * offsets ride along so consumers can slice the original text
    * without re-chunking. Downstream dedup shuffles only the exploded
    * (fp, id, len) triple, never content. MD5 (vs the 64-bit xxhash
    * fingerprints elsewhere) keeps chunk equality collision-safe at
    * 100 TB chunk counts (2^64 birthday bound is reachable there) and
    * ANSI-SQL-recomputable.
    */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String,
                maskBits: Int = 5, minLen: Int = 16, maxLen: Int = 128): DataFrame = {
    val ends = TextFunctions.cdcBoundaries(col(textCol), maskBits, minLen, maxLen)
    df.select(col(idCol), col(textCol).as("__text"), ends.as("__ends"))
      // empty text -> empty ends, but the prepended 0 in __starts would
      // zip one spurious (0, null) row; null text drops in the explode
      .filter(size(col("__ends")) > 0)
      .withColumn("__starts",
        concat(array(lit(0)), slice(col("__ends"), lit(1),
          greatest(size(col("__ends")) - 1, lit(0)))))
      .select(col(idCol), col("__text"),
        posexplode(arrays_zip(col("__starts"), col("__ends"))))
      .select(
        col(idCol),
        col("pos").as("chunk_idx"),
        col("col.__starts").as("chunk_start"),
        (col("col.__ends") - col("col.__starts")).as("chunk_len"),
        md5(encode(col("__text").substr(col("col.__starts") + 1,
          col("col.__ends") - col("col.__starts")), "UTF-8")).as("chunk_fp"))
  }

  /** Per-document chunk-sharing profile over [[cdcChunks]] output:
    * (id, n_chunks, n_shared, shared_len) where a chunk is "shared"
    * when its fingerprint occurs in at least one OTHER document — the
    * triage report that ranks a corpus for partial-overlap dedup
    * (recrawls, boilerplate, quoted passages) the pair-level operators
    * then resolve.
    *
    * Scale shape: the fingerprint census is one hash aggregate on
    * `chunk_fp` carrying (fp, distinct-id count) — partial-aggregated
    * map-side; the join back is fp-to-fp, and the final per-doc rollup
    * is the last shuffle. Content never moves: every shuffled row is a
    * fingerprint + two numbers. The census join is left to Catalyst on
    * purpose: below the broadcast threshold (small corpora, or a census
    * pre-filtered to nd > 1 duplicates only) it broadcasts; at corpus
    * scale it exceeds the threshold and plans as a co-partitioned
    * shuffle join that reuses the census exchange on one side.
    */
  /** Distinct chunk fingerprints of a corpus — the CDC member of the
    * persisted-index family beside [[fingerprints]] (whole-document)
    * and [[minhashIndex]] (near-dup): one narrow chunking pass plus one
    * distinct aggregation, ~16 B + id per surviving fingerprint and the
    * corpus text never needs re-reading afterwards.
    */
  def cdcFpIndex(docs: DataFrame, textCol: String, idCol: String,
                 maskBits: Int = 5, minLen: Int = 16, maxLen: Int = 128): DataFrame =
    cdcChunks(docs, textCol, idCol, maskBits, minLen, maxLen)
      .select(col("chunk_fp")).distinct()

  /** Ingestion-time partial-overlap screen — the incremental form of
    * [[cdcSharedStats]]: each new document reports how many of its CDC
    * chunks (and how much of its length) the historical corpus already
    * contains, via a probe of the persisted [[cdcFpIndex]] rather than
    * any re-read of history text. Shift-resilient by construction: a
    * recrawled page with one inserted paragraph still matches all its
    * unchanged chunks, which whole-document fingerprints
    * ([[incrementalExact]]) score as 0% known.
    *
    * Scale shape: per ingest, the batch is chunked in one narrow pass
    * and the probe join shuffles O(batch chunks) fingerprints; written
    * bucketed on `chunk_fp` (the [[fingerprints]] pattern) the history
    * side joins exchange-free. known_len / a length threshold is the
    * admit/reject gate; 0 known chunks = genuinely new content.
    */
  def incrementalCdc(newDocs: DataFrame, historyFps: DataFrame,
                     textCol: String, idCol: String,
                     maskBits: Int = 5, minLen: Int = 16, maxLen: Int = 128): DataFrame = {
    val hist = historyFps.select(col("chunk_fp")).withColumn("__hit", lit(1L))
    cdcChunks(newDocs, textCol, idCol, maskBits, minLen, maxLen)
      .join(hist, Seq("chunk_fp"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_known"),
        sum(when(col("__hit").isNotNull, col("chunk_len").cast("long"))
          .otherwise(0L)).as("known_len"))
  }

  def cdcSharedStats(chunks: DataFrame, idCol: String): DataFrame = {
    val census = chunks.groupBy(col("chunk_fp"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    chunks.join(census, "chunk_fp")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("__nd") > 1, col("chunk_len").cast("long"))
          .otherwise(0L)).as("shared_len"))
  }
}
