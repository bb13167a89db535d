package graft

/** Generates DuckDB SQL that recomputes the MinHash+LSH pipeline
  * EXACTLY — same XXH64 bit-for-bit — so `q_dedup_minhash` and
  * `q_incremental_minhash` sit under the driver's hash-equality oracle
  * instead of only their in-plan recall gates.
  *
  * Why generation instead of hand-written SQL: the pipeline needs
  * Spark's XXH64 (`org.apache.spark.sql.catalyst.expressions.XXH64`,
  * seed-42 string hashing, per-member `hashLong(h, k)` remixes, the
  * banded `xxhash64(...)` fold) evaluated inside DuckDB, which has no
  * xxhash64. The hash is therefore re-expressed as pure modular
  * arithmetic on HUGEINT (values carried in [0, 2^64)): multiplication
  * mod 2^64 via 32-bit limb split, rotation as div/mod by powers of
  * two, xor through UBIGINT. A naive inline expansion of that would be
  * exponential in text size (every rotate/xor references its operand
  * twice), so each primitive step becomes one column in a CHAIN of
  * nested SELECTs — sharing through column references keeps the SQL
  * linear (~26 KB / ~36 KB) and DuckDB evaluates it vectorized.
  *
  * Faithfulness notes, each load-bearing and pinned by the driver's
  * hash compare (validated cell-exact against the engine's dump at
  * sf0.01 before landing):
  *  - byte-level hashing uses the <32-byte XXH64 path only: shingles
  *    are 5 chars = at most 20 UTF-8 bytes (4-byte chars), and the
  *    whole-string fallback only fires for texts of <= 5 chars;
  *  - 8-byte words and the 4-byte chunk are LITTLE-endian, matching
  *    `Platform.getLong/getInt` on x86;
  *  - the signature min is Java's SIGNED long min: the unsigned
  *    representation is mapped through `v XOR 2^63` (an involution)
  *    before MIN and back after;
  *  - the LSH bucket cap (collectSmallest 4096) is NOT modeled: at the
  *    oracle's sf0.01 no band bucket comes near 4096 members, and the
  *    cap dropping a member would be a real recall loss the compare
  *    SHOULD flag.
  */
object OracleSqlGen {

  // XXH64 primes (public xxHash specification constants), as decimal
  // strings for direct splicing; all arithmetic below is HUGEINT.
  private val P1 = java.lang.Long.toUnsignedString(0x9E3779B185EBCA87L)
  private val P2 = java.lang.Long.toUnsignedString(0xC2B2AE3D27D4EB4FL)
  private val P3 = java.lang.Long.toUnsignedString(0x165667B19E3779F9L)
  private val P4 = java.lang.Long.toUnsignedString(0x85EBCA77C2B2AE63L)
  private val P5 = java.lang.Long.toUnsignedString(0x27D4EB2F165667C5L)
  private val M64 = "18446744073709551616" // 2^64
  private val S63 = "9223372036854775808"  // 2^63
  /** (P5 + 8) mod 2^64 — the hashLong seed offset, pre-folded. */
  private val P5p8 = java.lang.Long.toUnsignedString(0x27D4EB2F165667C5L + 8L)
  /** (42 + P5) mod 2^64 — the byte-path seed offset, pre-folded. */
  private val Seed42P5 = java.lang.Long.toUnsignedString(42L + 0x27D4EB2F165667C5L)

  /** a * b mod 2^64 via 32-bit limb split (a full 64x64 product can
    * overflow even HUGEINT). */
  private def m64(a: String, b: String): String =
    s"(((($a) % 4294967296) * ($b) + (((($a) // 4294967296) * ($b)) % 4294967296) * 4294967296) % $M64)"

  /** rotate-left by r on a 64-bit value; result < 2^64 by construction. */
  private def rot(x: String, r: Int): String = {
    val lo = java.math.BigInteger.ONE.shiftLeft(64 - r)
    s"((($x) % $lo) * ${java.math.BigInteger.ONE.shiftLeft(r)} + ($x) // $lo)"
  }

  private def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(x: String, n: Int): String =
    s"(($x) // ${java.math.BigInteger.ONE.shiftLeft(n)})"

  private def add64(a: String, b: String): String = s"((($a) + ($b)) % $M64)"

  /** Signed-order key: v XOR 2^63 in the unsigned representation. */
  private def signedKey(v: String): String =
    s"CASE WHEN $v >= $S63 THEN $v - $S63 ELSE $v + $S63 END"

  /** Chain of SELECT levels — each level adds ONE named column over the
    * previous, so every intermediate is shared by reference and the
    * generated text stays linear in the step count. Emitted as a FLAT
    * CTE list, not nested subqueries: a ~200-level nest trips DuckDB's
    * parser recursion limit ("memory exhausted"), a 200-entry WITH list
    * does not. Level CTE names live in the subquery's own WITH scope,
    * so two chains embedded in one outer query cannot collide. */
  private final class Chain(baseSql: String) {
    private val ctes =
      scala.collection.mutable.ArrayBuffer("chain_base" -> s"($baseSql)")
    def lvl(name: String, expr: String): String = {
      val prev = ctes.last._1
      ctes += (s"l_$name" -> s"(SELECT *, $expr AS $name FROM $prev)")
      name
    }
    def sql: String = {
      val w = ctes.map { case (n, s) => s"$n AS $s" }.mkString(",\n")
      s"WITH $w SELECT * FROM ${ctes.last._1}"
    }
  }

  private def fmix(ch: Chain, h0: String, p: String): String = {
    val f1 = ch.lvl(s"${p}f1", xor64(h0, shr(h0, 33)))
    val f2 = ch.lvl(s"${p}f2", m64(f1, P2))
    val f3 = ch.lvl(s"${p}f3", xor64(f2, shr(f2, 29)))
    val f4 = ch.lvl(s"${p}f4", m64(f3, P3))
    ch.lvl(s"${p}f5", xor64(f4, shr(f4, 32)))
  }

  /** XXH64.hashLong(x, seed) levels; returns the result column. */
  private def hashLong(ch: Chain, x: String, seed: String, p: String): String = {
    val t1 = ch.lvl(s"${p}t1", m64(x, P2))
    val t2 = ch.lvl(s"${p}t2", rot(t1, 31))
    val t3 = ch.lvl(s"${p}t3", m64(t2, P1))
    val t4 = ch.lvl(s"${p}t4", xor64(add64(seed, P5p8), t3))
    val t5 = ch.lvl(s"${p}t5", rot(t4, 27))
    val t6 = ch.lvl(s"${p}t6", add64(m64(t5, P1), P4))
    fmix(ch, t6, p)
  }

  private def wordRound(ch: Chain, h: String, w: String, guard: String,
                        p: String): String = {
    val a1 = ch.lvl(s"${p}a1", m64(w, P2))
    val a2 = ch.lvl(s"${p}a2", rot(a1, 31))
    val a3 = ch.lvl(s"${p}a3", m64(a2, P1))
    val a4 = ch.lvl(s"${p}a4", xor64(h, a3))
    val a5 = ch.lvl(s"${p}a5", rot(a4, 27))
    val a6 = ch.lvl(s"${p}a6", add64(m64(a5, P1), P4))
    ch.lvl(s"${p}h", s"CASE WHEN $guard THEN $a6 ELSE $h END")
  }

  /** Byte value (0..255) at 1-based dynamic byte index of the padded
    * hex column. */
  private def byteAt(hxp: String, i: String): String =
    s"CAST(CAST('0x' || substr($hxp, CAST(2 * ($i) - 1 AS BIGINT), 2) AS BIGINT) AS HUGEINT)"

  /** XXH64.hashUnsafeBytes(bytes(hxCol), seed) levels for < 32-byte
    * inputs appended to an existing chain: 0-3 LE words, optional LE
    * 4-byte chunk, 0-3 tail bytes, fmix. `seed` is any prior column or
    * literal (the struct-fold callers thread a running hash through).
    *
    * The three guarded word rounds cover the ENTIRE short-input domain
    * (nn <= 31: up to 3×8-byte words + 4-byte chunk + 3 tail bytes);
    * XXH64 switches to the 4-accumulator stripe algorithm at 32 bytes,
    * which this replay deliberately does not model — a >= 32-byte input
    * (e.g. an over-long word after a corpus regeneration) raises a
    * NAMED DuckDB error via the final guard level instead of silently
    * hashing wrong and surfacing as a bare oracle hash mismatch. */
  private def hashBytesLevels(ch: Chain, hxCol: String, seed: String,
                              p: String): String = {
    // 64+8 spare pad + clamped dynamic reads (same pattern as the
    // murmur chain, ADVICE r10): every substr below is in-range for ANY
    // input length, so an out-of-domain (>= 32-byte) input can only
    // fail through the NAMED error() guard — never through a DuckDB
    // version-dependent bare substr/CAST('0x'||'') failure. The clamps
    // (8·wc at 28, tail index at 32) are no-ops across the whole
    // in-domain range nn <= 31 (8·wc <= 24, tail index <= nn <= 31).
    val hxp = ch.lvl(s"${p}hxp", s"rpad($hxCol, 72, '0')")
    val nn = ch.lvl(s"${p}nn", s"CAST(length($hxCol) // 2 AS HUGEINT)")
    val wc = ch.lvl(s"${p}wcnt", s"($nn // 8)")
    val rem = ch.lvl(s"${p}rem", s"($nn - 8 * $wc)")
    val tl = ch.lvl(s"${p}tl", s"CASE WHEN $rem >= 4 THEN $rem - 4 ELSE $rem END")
    def leSum(idx: Int => String, n: Int): String =
      (0 until n).map { i =>
        s"${byteAt(hxp, idx(i))} * ${java.math.BigInteger.ONE.shiftLeft(8 * i)}"
      }.mkString(" + ")
    val wA = ch.lvl(s"${p}wA", leSum(i => s"${i + 1}", 8))
    val wB = ch.lvl(s"${p}wB", leSum(i => s"${i + 9}", 8))
    val wC = ch.lvl(s"${p}wC", leSum(i => s"${i + 17}", 8))
    val k4 = ch.lvl(s"${p}k4", leSum(j => s"least(8 * $wc, 28) + ${j + 1}", 4))
    val tb = (1 to 3).map(j =>
      ch.lvl(s"${p}tb$j", byteAt(hxp, s"least($nn - $tl + $j, 32)")))
    var h = ch.lvl(s"${p}c0",
      s"CASE WHEN $nn >= 32 THEN CAST(error('graft oracle: xxh64 short-input replay got ' || $nn || ' bytes (>= 32) — out of domain, see OracleSqlGen.hashBytesLevels') AS HUGEINT) ELSE ${add64(add64(seed, P5), nn)} END")
    h = wordRound(ch, h, wA, s"$nn >= 8", s"${p}wa")
    h = wordRound(ch, h, wB, s"$nn >= 16", s"${p}wb")
    h = wordRound(ch, h, wC, s"$nn >= 24", s"${p}wc")
    val c1 = ch.lvl(s"${p}c1", xor64(h, m64(k4, P1)))
    val c2 = ch.lvl(s"${p}c2", rot(c1, 23))
    val c3 = ch.lvl(s"${p}c3", add64(m64(c2, P2), P3))
    h = ch.lvl(s"${p}chk", s"CASE WHEN $rem >= 4 THEN $c3 ELSE $h END")
    for (j <- 1 to 3) {
      val b1 = ch.lvl(s"${p}b${j}1", xor64(h, m64(tb(j - 1), P5)))
      val b2 = ch.lvl(s"${p}b${j}2", rot(b1, 11))
      val b3 = ch.lvl(s"${p}b${j}3", m64(b2, P1))
      h = ch.lvl(s"${p}bh$j", s"CASE WHEN $tl >= $j THEN $b3 ELSE $h END")
    }
    fmix(ch, h, s"${p}sb")
  }

  /** Seed-42 byte hash over a fresh chain — the original single-string
    * entry point ([[shingleHashSql]], [[importance]]). */
  private def hashBytesChain(baseSql: String, hxCol: String): (Chain, String) = {
    val ch = new Chain(baseSql)
    (ch, hashBytesLevels(ch, hxCol, "42", ""))
  }

  /** (doc_id, h) — the distinct 5-char-shingle XXH64 set per document,
    * mirroring TextFunctions.shingleHashes (lower+trim, whole-string
    * fallback for <= n chars, hash-level dedup). The byte-hash chain
    * runs over DISTINCT shingle strings and joins back: the corpus
    * repeats shingles heavily (measured 102k (doc, gram) pairs over
    * 2k distinct grams at sf0.01), so hashing per pair cost ~50x more
    * for identical results. */
  private def shingleHashSql(n: Int): String = {
    val gd =
      s"""SELECT doc_id, unnest(CASE WHEN length(s) <= $n THEN [s]
         |    ELSE list_distinct([substr(s, i, $n) for i in range(1, length(s) - ${n - 2})])
         |  END) AS g
         |FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents
         |      WHERE text IS NOT NULL)""".stripMargin
    val base =
      s"""SELECT g, hex(encode(g)) AS hx FROM (
         |  SELECT DISTINCT g FROM ($gd))""".stripMargin
    val (ch, hcol) = hashBytesChain(base, "hx")
    s"""SELECT doc_id, h FROM ($gd) gd
       |JOIN (SELECT g, $hcol AS h FROM (${ch.sql})) gh USING (g)
       |GROUP BY doc_id, h""".stripMargin
  }

  /** (doc_id, kk, v) — MinHash member kk = signed-min over
    * hashLong(h, kk), unsigned representation restored after the MIN.
    * The k-member remix runs per DISTINCT hash value and joins back
    * (same dedup-then-join shape as [[shingleHashSql]]). */
  private def sigSql(hsSql: String, k: Int): String = {
    val ch = new Chain(
      s"SELECT h, unnest(range($k)) AS kk FROM (SELECT DISTINCT h FROM ($hsSql))")
    val v = hashLong(ch, "h", "kk", "mh")
    ch.lvl("skey", signedKey(v))
    s"""SELECT hs.doc_id, mh.kk, ${signedKey("min(mh.skey)")} AS v
       |FROM ($hsSql) hs JOIN (${ch.sql}) mh USING (h)
       |GROUP BY hs.doc_id, mh.kk""".stripMargin
  }

  /** (doc_id, band, bh) — band hash = Spark xxhash64 fold (seed 42)
    * over the band's r consecutive signature members. */
  private def bandSql(sigSql: String, bands: Int, r: Int): String = {
    val sigl =
      s"SELECT doc_id, list(v ORDER BY kk) AS sig FROM ($sigSql) GROUP BY doc_id"
    val ch = new Chain(
      s"SELECT doc_id, sig, unnest(range($bands)) AS band FROM ($sigl)")
    var h = "42"
    for (i <- 0 until r) {
      val x = ch.lvl(s"x$i", s"sig[band * $r + ${i + 1}]")
      h = hashLong(ch, x, h, s"bd$i")
    }
    s"SELECT doc_id, band, $h AS bh FROM (${ch.sql})"
  }

  private def jaccard(a: String, b: String): String =
    s"""round(CAST(len(list_intersect($a, $b)) AS DOUBLE)
       |      / (len($a) + len($b) - len(list_intersect($a, $b))), 6)""".stripMargin

  /** Oracle for q_dedup_minhash: the full LSH candidate set (band
    * buckets -> within-bucket pairs), exact hash-set Jaccard >= 0.5,
    * and the same blocked-truth recall gate at floor 0.9. */
  lazy val dedupMinhash: String = {
    val hs = shingleHashSql(5)
    val bnd = bandSql(sigSql("SELECT * FROM hs", 16), 4, 4)
    s"""WITH hs AS MATERIALIZED ($hs),
       |band AS MATERIALIZED ($bnd),
       |sets AS MATERIALIZED (SELECT doc_id, list(h) AS g FROM hs GROUP BY doc_id),
       |bucket AS (
       |  SELECT band, bh, list_sort(list(doc_id)) AS ids
       |  FROM band GROUP BY band, bh HAVING count(*) > 1),
       |cand AS (
       |  SELECT DISTINCT p[1] AS id_a, p[2] AS id_b
       |  FROM (SELECT unnest(flatten([[[ids[i], ids[j]] for j in range(i + 1, len(ids) + 1)]
       |                               for i in range(1, len(ids) + 1)])) AS p
       |        FROM bucket)),
       |out AS (
       |  SELECT c.id_a, c.id_b, ${jaccard("a.g", "b.g")} AS jaccard
       |  FROM cand c JOIN sets a ON a.doc_id = c.id_a
       |              JOIN sets b ON b.doc_id = c.id_b
       |  WHERE ${jaccard("a.g", "b.g")} >= 0.5),
       |docblk AS (
       |  SELECT s.doc_id, d.lang || '#' || CAST(d.doc_id % 16 AS VARCHAR) AS blk, s.g
       |  FROM sets s JOIN documents d ON d.doc_id = s.doc_id),
       |truth AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM docblk a JOIN docblk b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  WHERE ${jaccard("a.g", "b.g")} >= 0.5),
       |recall AS (
       |  SELECT coalesce(sum(CASE WHEN o.id_a IS NOT NULL THEN 1 ELSE 0 END) * 1.0
       |                  / nullif(count(*), 0), 1.0) AS r
       |  FROM truth t LEFT JOIN (SELECT DISTINCT id_a, id_b FROM out) o
       |    ON t.id_a = o.id_a AND t.id_b = o.id_b)
       |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       |       jaccard, round(r, 6) AS recall
       |FROM out, recall WHERE r >= 0.9""".stripMargin
  }

  /** Oracle for q_incremental_minhash: history = doc_id % 4 = 0 (the
    * persisted index side), batch = the rest; candidates from the
    * band-key join, scored by exact signature agreement / 16, recall
    * gated at 0.9 against the cross-set blocked truth. */
  lazy val incrementalMinhash: String = {
    val hs = shingleHashSql(5)
    val sg = sigSql("SELECT * FROM hs", 16)
    val bnd = bandSql("SELECT * FROM sig", 4, 4)
    s"""WITH hs AS MATERIALIZED ($hs),
       |sig AS MATERIALIZED ($sg),
       |band AS MATERIALIZED ($bnd),
       |sets AS MATERIALIZED (SELECT doc_id, list(h) AS g FROM hs GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT nb.doc_id AS new_id, hb.doc_id AS hist_id
       |  FROM (SELECT * FROM band WHERE doc_id % 4 <> 0) nb
       |  JOIN (SELECT * FROM band WHERE doc_id % 4 = 0) hb
       |    ON nb.band = hb.band AND nb.bh = hb.bh),
       |out AS (
       |  SELECT c.new_id, c.hist_id,
       |         round(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) * 1.0 / 16, 6) AS est_jaccard
       |  FROM cand c
       |  JOIN sig a ON a.doc_id = c.new_id
       |  JOIN sig b ON b.doc_id = c.hist_id AND b.kk = a.kk
       |  GROUP BY c.new_id, c.hist_id
       |  HAVING round(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) * 1.0 / 16, 6) >= 0.5),
       |docblk AS (
       |  SELECT s.doc_id, d.lang || '#' || CAST(d.doc_id % 16 AS VARCHAR) AS blk, s.g
       |  FROM sets s JOIN documents d ON d.doc_id = s.doc_id),
       |truth AS (
       |  SELECT CASE WHEN a.doc_id % 4 <> 0 THEN a.doc_id ELSE b.doc_id END AS new_id,
       |         CASE WHEN a.doc_id % 4 = 0 THEN a.doc_id ELSE b.doc_id END AS hist_id
       |  FROM docblk a JOIN docblk b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  WHERE (a.doc_id % 4 = 0) <> (b.doc_id % 4 = 0)
       |    AND ${jaccard("a.g", "b.g")} >= 0.5),
       |recall AS (
       |  SELECT coalesce(sum(CASE WHEN o.new_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
       |                  / nullif(count(*), 0), 1.0) AS r
       |  FROM truth t LEFT JOIN (SELECT DISTINCT new_id, hist_id FROM out) o
       |    ON t.new_id = o.new_id AND t.hist_id = o.hist_id)
       |SELECT CAST(new_id AS BIGINT) AS new_id, CAST(hist_id AS BIGINT) AS hist_id,
       |       est_jaccard, round(r, 6) AS recall
       |FROM out, recall WHERE r >= 0.9""".stripMargin
  }

  /** Oracle for q_hilbert: DuckDB replays the scale-by-scale Hilbert
    * walk (accumulate Gray-coded quadrant offset, rotate/reflect the
    * frame) as one chained-CTE state machine per row — plain BIGINT,
    * because curve math is integer-exact, which is exactly what makes
    * layout keys oracle-able where the float32-bound ANN families are
    * not. Inputs are saturating-clamped to the bucket range like the
    * kernel; the decoded (dx, dy) columns are the clamped coordinates
    * (the round trip is the identity on in-range cells). */
  lazy val hilbertLayout: String = {
    val bits = 16
    val n = 1L << bits
    val ch = new Chain(
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST(p_partkey % 65536 AS BIGINT) AS x0,
        |       CAST((p_partkey * 31 + p_size * 7) % 65536 - 64 AS BIGINT) AS yraw
        |FROM part""".stripMargin)
    var x = ch.lvl("xc", s"greatest(0, least(${n - 1}, x0))")
    var y = ch.lvl("yc", s"greatest(0, least(${n - 1}, yraw))")
    var d = ch.lvl("dz", "CAST(0 AS BIGINT)")
    for (i <- 0 until bits) {
      val s = 1L << (bits - 1 - i)
      val rx = ch.lvl(s"h${i}rx", s"CASE WHEN ($x & $s) != 0 THEN 1 ELSE 0 END")
      val ry = ch.lvl(s"h${i}ry", s"CASE WHEN ($y & $s) != 0 THEN 1 ELSE 0 END")
      d = ch.lvl(s"h${i}d", s"$d + $s * $s * xor(3 * $rx, $ry)")
      val xf = ch.lvl(s"h${i}xf",
        s"CASE WHEN $ry = 0 AND $rx = 1 THEN ${n - 1} - $x ELSE $x END")
      val yf = ch.lvl(s"h${i}yf",
        s"CASE WHEN $ry = 0 AND $rx = 1 THEN ${n - 1} - $y ELSE $y END")
      x = ch.lvl(s"h${i}x", s"CASE WHEN $ry = 0 THEN $yf ELSE $xf END")
      y = ch.lvl(s"h${i}y", s"CASE WHEN $ry = 0 THEN $xf ELSE $yf END")
    }
    s"""SELECT id, CAST(x0 AS INTEGER) AS x, CAST(yraw AS INTEGER) AS y,
       |       CAST($d AS BIGINT) AS hkey,
       |       CAST(xc AS INTEGER) AS dx, CAST(yc AS INTEGER) AS dy
       |FROM (${ch.sql})""".stripMargin
  }

  /** Oracle for q_importance (DSIR-style importance weighting): the
    * feature buckets are `xxhash64(word) pmod 256` — replayed exactly
    * by the [[hashBytesChain]] machinery over the distinct-word
    * dictionary (corpus words are <= 8 UTF-8 bytes, well inside the
    * chain's <32-byte domain; a longer future vocabulary would surface
    * as a hash mismatch, not silent corruption). 256 is a power of
    * two, so the signed `pmod` equals the unsigned `% 256` and no
    * sign conversion is needed. λ ratios are ln of integer-derived
    * IEEE quotients; the per-document mean is rounded to 6 digits —
    * the same double-parity contract q_lm_score has held for rounds.
    * Selection ranks on the ROUNDED score with a doc-id tie-break. */
  /** The shared CTE prefix for every query built on the DSIR
    * importance scorer: dictionary hashing → bucket counts → λ ratios
    * → per-doc `ag` (doc_id, nw, score). Factored out so the scorer-
    * evaluation oracles ([[scoreAuc]], [[scoreCalibration]]) replay
    * the exact same scorer the q_importance oracle does. */
  private lazy val importanceScoredCtes: String = {
    // DISTINCT must wrap the unnested ROWS — `SELECT DISTINCT unnest(l)`
    // dedupes the lists before unnesting, which both leaks duplicate
    // words and drops none (observed: 41 dict rows over a 31-word
    // vocabulary)
    // plain (non-interpolated) triple quote: backslashes are literal,
    // so the regex is written single-backslashed here, unlike the
    // s-interpolated blocks below where \\t collapses to \t
    val base =
      """SELECT w, hex(encode(w)) AS hx FROM (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(trim(text)), '[ \t\n\x0B\f\r]+'),
        |      x -> x <> '')) AS w
        |    FROM documents WHERE text IS NOT NULL))""".stripMargin
    val (ch, hcol) = hashBytesChain(base, "hx")
    s"""dictw AS MATERIALIZED (
       |  SELECT w, CAST($hcol % 256 AS BIGINT) AS b FROM (${ch.sql})),
       |tokd AS (
       |  SELECT doc_id, lang,
       |         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |tb AS (SELECT t.doc_id, t.lang, d.b FROM tokd t JOIN dictw d USING (w)),
       |tc AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
       |sc AS (SELECT b, count(*) AS cs FROM tb
       |       WHERE lang <> 'en' OR lang IS NULL GROUP BY b),
       |tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tc) AS tt,
       |               (SELECT coalesce(sum(cs), 0) FROM sc) AS ts),
       |lam AS (
       |  SELECT r.range AS b,
       |         ln((coalesce(tc.ct, 0) + 1.0) / (tot.tt + 256.0))
       |           - ln((coalesce(sc.cs, 0) + 1.0) / (tot.ts + 256.0)) AS lambda
       |  FROM range(256) r
       |  LEFT JOIN tc ON tc.b = r.range LEFT JOIN sc ON sc.b = r.range
       |  CROSS JOIN tot),
       |ag AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS nw, round(avg(lambda), 6) AS score
       |  FROM tb JOIN lam USING (b) GROUP BY doc_id)""".stripMargin
  }

  lazy val importance: String = {
    s"""WITH $importanceScoredCtes,
       |scored AS (
       |  SELECT d.doc_id, coalesce(a.nw, 0) AS n_words, a.score
       |  FROM documents d LEFT JOIN ag a USING (doc_id)),
       |top AS (
       |  SELECT doc_id FROM scored
       |  ORDER BY score DESC NULLS LAST, doc_id LIMIT 100)
       |SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
       |       CAST(s.n_words AS BIGINT) AS n_words, s.score,
       |       CAST(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS selected
       |FROM scored s LEFT JOIN top t USING (doc_id)""".stripMargin
  }

  /** The shared binning CTEs for the scorer-evaluation oracles:
    * replay the DSIR scorer ([[importanceScoredCtes]]), label each
    * scored doc y = (lang = 'en'), min-max normalize, and floor into
    * `bins` buckets — mirroring [[graft.operators.Evaluation]]'s
    * expression structure op for op (same IEEE subtract/divide/
    * multiply/floor, same mx = mn collapse, same LEAST clamp). */
  private def evalBinnedCtes(bins: Int): String =
    s"""$importanceScoredCtes,
       |flt AS (
       |  SELECT a.doc_id, a.score AS s,
       |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM ag a JOIN documents d USING (doc_id)
       |  WHERE a.score IS NOT NULL),
       |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM flt),
       |bn AS MATERIALIZED (
       |  SELECT CASE WHEN mm.mx = mm.mn THEN 0
       |              ELSE LEAST(CAST(floor(((f.s - mm.mn) / (mm.mx - mm.mn))
       |                                    * ${bins.toDouble}) AS BIGINT),
       |                         ${bins - 1}) END AS bin,
       |         f.doc_id, f.y, f.s
       |  FROM flt f CROSS JOIN mm)""".stripMargin

  /** Oracle for q_score_auc ([[graft.operators.Evaluation
    * .binnedRankingMetrics]]): per-bin counts, prefix sums over the
    * bounded bin table, then the Mann-Whitney AUC (exact HUGEINT
    * numerator — DuckDB's integer sums mirror Spark's decimal(38,0))
    * and KS (per-bin double numerators, identical IEEE products)
    * with one final division each. */
  def scoreAuc(bins: Int): String =
    s"""WITH ${evalBinnedCtes(bins)},
       |pb AS MATERIALIZED (
       |  SELECT bin, count(*) AS n, sum(y) AS np, count(*) - sum(y) AS nn
       |  FROM bn GROUP BY bin),
       |cm AS (
       |  SELECT bin, n, np, nn,
       |         COALESCE(SUM(nn) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg,
       |         COALESCE(SUM(np) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpos
       |  FROM pb),
       |tt AS (SELECT sum(np) AS p_tot, sum(nn) AS n_tot FROM pb)
       |SELECT CAST(sum(c.n) AS BIGINT) AS n,
       |       CAST(max(t.p_tot) AS BIGINT) AS n_pos,
       |       CAST(max(t.n_tot) AS BIGINT) AS n_neg,
       |       CASE WHEN max(t.p_tot) > 0 AND max(t.n_tot) > 0 THEN
       |         round(CAST(sum(c.np * (2 * c.cumneg + c.nn)) AS DOUBLE)
       |               / (2.0 * CAST(max(t.p_tot) AS DOUBLE)
       |                      * CAST(max(t.n_tot) AS DOUBLE)), 6)
       |       END AS auc,
       |       CASE WHEN max(t.p_tot) > 0 AND max(t.n_tot) > 0 THEN
       |         round(max(abs(CAST(c.cumpos + c.np AS DOUBLE)
       |                         * CAST(t.n_tot AS DOUBLE)
       |                       - CAST(c.cumneg + c.nn AS DOUBLE)
       |                         * CAST(t.p_tot AS DOUBLE)))
       |               / (CAST(max(t.p_tot) AS DOUBLE)
       |                  * CAST(max(t.n_tot) AS DOUBLE)), 6)
       |       END AS ks
       |FROM cm c CROSS JOIN tt t""".stripMargin

  /** Oracle for q_score_calibration ([[graft.operators.Evaluation
    * .binnedCalibration]]): per-bin size, positive rate, and the
    * micro-quantized mean score — integer sums, one division each. */
  def scoreCalibration(bins: Int): String =
    s"""WITH ${evalBinnedCtes(bins)}
       |SELECT CAST(bin AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(y) AS BIGINT) AS n_pos,
       |       round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |         AS pos_rate,
       |       round(CAST(sum(CAST(round(s * 1000000.0, 0) AS BIGINT))
       |                  AS DOUBLE)
       |             / (1000000.0 * CAST(count(*) AS DOUBLE)), 6)
       |         AS mean_score
       |FROM bn GROUP BY bin""".stripMargin

  /** Oracle for q_score_gate ([[graft.operators.Evaluation
    * .gateTopRate]]): per-bin counts, a top-down suffix sum over the
    * bounded bin table, the highest bin whose suffix reaches
    * ceil(rate·n), and the per-row kept flag. Pure integer logic
    * after the shared bin assignment. */
  def scoreGate(keepRate: String, bins: Int): String =
    s"""WITH ${evalBinnedCtes(bins)},
       |pb AS MATERIALIZED (SELECT bin, count(*) AS n FROM bn GROUP BY bin),
       |cm AS (
       |  SELECT bin, SUM(n) OVER (ORDER BY bin DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM pb),
       |tt AS (SELECT sum(n) AS total FROM pb),
       |th AS (
       |  SELECT max(bin) AS t FROM cm CROSS JOIN tt
       |  WHERE cum >= CAST(ceil($keepRate * CAST(total AS DOUBLE)) AS BIGINT))
       |SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.s AS score,
       |       CAST(b.y AS BIGINT) AS y,
       |       CAST(b.bin >= th.t AS BIGINT) AS kept
       |FROM bn b CROSS JOIN th""".stripMargin

  /** Oracle for q_kmeans ([[graft.operators.KMeans]]): replays the
    * ENTIRE Lloyd loop — micro-quantization, farthest-first seeding,
    * per-iteration exact-integer argmin assignment (ties to lowest cid
    * via the [dist, cid] arg_min key) and floor(sum/count) centroid
    * updates with empty-cluster carryover — as a MATERIALIZED CTE
    * chain. Replayable for the same reason the classifier is: no
    * order-sensitive float accumulation anywhere (distances are exact
    * BIGINT sums; the single division per dimension happens on
    * integer-valued doubles ≤ 2^53). */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): (String, String) = {
    def dist(v: String, c: String): String =
      s"CAST(list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> ($v.q[i] - $c.q[i]) * ($v.q[i] - $c.q[i]))) AS BIGINT)"
    // arg_min key must be scalar in DuckDB: dist·16 + cid is order-
    // equivalent to lexicographic (dist, cid) while cid < 16 and
    // dist·16 ≤ 4·10¹⁵ stays far inside BIGINT
    require(k <= 16, s"oracle arg_min key encoding assumes k <= 16, got $k")
    def assignSql(cTab: String): String =
      s"""SELECT v.vec_id,
         |       arg_min(c.cid, ${dist("v", "c")} * 16 + c.cid) AS cid
         |FROM qv v CROSS JOIN $cTab c GROUP BY v.vec_id""".stripMargin
    // farthest-first seeding: f1 = lowest id; each further pick is the
    // vector maximizing its min distance to the chosen set (ties to
    // the lowest id) — mirrors KMeans.farthestFirst exactly
    val seedCtes = (2 to k).map { j =>
      s"""f$j AS MATERIALIZED (
         |  SELECT * FROM f${j - 1}
         |  UNION ALL
         |  SELECT CAST(${j - 1} AS BIGINT) AS cid, v2.q
         |  FROM (
         |    SELECT v.vec_id
         |    FROM qv v CROSS JOIN f${j - 1} c
         |    GROUP BY v.vec_id
         |    ORDER BY min(${dist("v", "c")}) DESC, v.vec_id LIMIT 1) p
         |  JOIN qv v2 USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val seedChain =
      s"""f1 AS MATERIALIZED (
         |  SELECT CAST(0 AS BIGINT) AS cid, q
         |  FROM qv ORDER BY vec_id LIMIT 1)${if (k > 1) ",\n" + seedCtes else ""},
         |c0 AS MATERIALIZED (SELECT cid, q FROM f$k)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (
         |  ${assignSql(s"c${i - 1}")}),
         |c$i AS MATERIALIZED (
         |  SELECT p.cid, COALESCE(nw.q, p.q) AS q
         |  FROM c${i - 1} p LEFT JOIN (
         |    SELECT cid,
         |           list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         |                     AS BIGINT) ORDER BY pos) AS q
         |    FROM (
         |      SELECT a.cid, r.range AS pos, sum(v.q[r.range]) AS s,
         |             count(*) AS n
         |      FROM a$i a JOIN qv v USING (vec_id)
         |      CROSS JOIN range(1, ${dim + 1}) r
         |      GROUP BY a.cid, r.range) GROUP BY cid) nw
         |  ON p.cid = nw.cid)""".stripMargin
    }.mkString(",\n")
    val ctes =
      s"""qv AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS q
         |  FROM embeddings),
         |$seedChain,
         |$iterCtes""".stripMargin
    (ctes, assignSql(s"c$iters"))
  }

  def kmeans(k: Int, iters: Int, dim: Int): String = {
    val (ctes, finalAssign) = kmeansCtes(k, iters, dim)
    s"""WITH $ctes
       |SELECT CAST(f.vec_id AS BIGINT) AS vec_id,
       |       CAST(f.cid AS BIGINT) AS cluster
       |FROM ($finalAssign) f""".stripMargin
  }

  /** Oracle for q_semantic_dedup ([[graft.operators.SemanticDedup]]):
    * the kmeans chain, then the exact-integer cosine ε-ball screen —
    * drop a vector iff a similar lower-id neighbor shares its cluster.
    * cos ≥ num/den replayed as dot > 0 ∧ dot²·den² ≥ num²·‖a‖²‖b‖² in
    * HUGEINT (mirrors Spark's decimal(38,0) exactly — both exact). */
  def semanticDedup(k: Int, iters: Int, dim: Int,
                    cosNum: Int, cosDen: Int): String = {
    val (ctes, finalAssign) = kmeansCtes(k, iters, dim)
    def dotAB =
      s"CAST(list_sum(list_transform(range(1, ${dim + 1}), " +
        "i -> a.q[i] * b.q[i])) AS BIGINT)"
    s"""WITH $ctes,
       |asg AS MATERIALIZED (
       |  SELECT f.vec_id, f.cid AS cluster, v.q,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |           i -> v.q[i] * v.q[i])) AS BIGINT) AS n2
       |  FROM ($finalAssign) f JOIN qv v USING (vec_id)),
       |drp AS MATERIALIZED (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE a.n2 > 0 AND b.n2 > 0 AND $dotAB > 0
       |    AND CAST($dotAB AS HUGEINT) * ($dotAB)
       |        * ${cosDen.toLong * cosDen} >=
       |        ${cosNum.toLong * cosNum} * CAST(a.n2 AS HUGEINT) * b.n2)
       |SELECT CAST(s.vec_id AS BIGINT) AS vec_id,
       |       CAST(s.cluster AS BIGINT) AS cluster,
       |       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM asg s LEFT JOIN drp d USING (vec_id)""".stripMargin
  }

  /** Oracle for q_quality_classifier ([[graft.operators.Classifier]]):
    * replays the ENTIRE training loop — hashed features, `iters`
    * delta-rule iterations, final scoring — as generated CTEs. What
    * makes an iterative float training loop replayable at all is the
    * operator's determinism-by-construction: the link function uses
    * only exactly-specified IEEE ops (no exp — libms differ), and every
    * order-sensitive reduction (the per-doc dot product, the per-bucket
    * gradient) is a sum of round(·×1e12) integers, exact under any
    * association. So each CTE below computes the same BITS Spark does,
    * and the final scores hash-compare. Buckets are xxhash64(word) %
    * `buckets` via [[hashBytesChain]] (the importance-oracle contract:
    * corpus words sit inside the <32-byte domain; longer words fail
    * loudly). Every multi-referenced CTE is MATERIALIZED (the PageRank
    * oracle lesson — DuckDB inlines by default, exponentially).
    */
  def classifier(buckets: Int, iters: Int, lr: String,
                 labelSql: String): String = {
    val S = "1000000000000.0"
    val base =
      """SELECT w, hex(encode(w)) AS hx FROM (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(trim(text)), '[ \t\n\x0B\f\r]+'),
        |      x -> x <> '')) AS w
        |    FROM documents WHERE text IS NOT NULL))""".stripMargin
    val (ch, hcol) = hashBytesChain(base, "hx")
    def zSel(wTab: String): String =
      s"""SELECT f.doc_id,
         |       CAST(SUM(CAST(round(w.w * f.x * $S, 0) AS BIGINT)) AS DOUBLE) / $S AS z
         |    FROM feats f JOIN $wTab w ON f.b = w.j
         |    GROUP BY f.doc_id""".stripMargin
    def sig(z: String): String = s"(0.5 + ($z) / (2.0 * (1.0 + abs($z))))"
    val iterCtes = (1 to iters).map { k =>
      s"""e$k AS MATERIALIZED (
         |  SELECT s.doc_id, ${sig("s.z")} - l.y AS err
         |  FROM (${zSel(s"w${k - 1}")}) s JOIN lab l USING (doc_id)),
         |w$k AS MATERIALIZED (
         |  SELECT w.j,
         |         w.w - $lr * (CAST(COALESCE(g.g, 0) AS DOUBLE) / $S)
         |               / (SELECT n FROM nn) AS w
         |  FROM w${k - 1} w LEFT JOIN (
         |    SELECT f.b AS j,
         |           SUM(CAST(round(e.err * f.x * $S, 0) AS BIGINT)) AS g
         |    FROM feats f JOIN e$k e USING (doc_id)
         |    GROUP BY f.b) g ON w.j = g.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH dictw AS MATERIALIZED (
       |  SELECT w, CAST($hcol % $buckets AS BIGINT) AS b FROM (${ch.sql})),
       |tokd AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN $labelSql THEN 1.0 ELSE 0.0 END AS y,
       |         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |lab AS MATERIALIZED (
       |  SELECT doc_id, ANY_VALUE(y) AS y, COUNT(*) AS nw
       |  FROM tokd GROUP BY doc_id),
       |feats AS MATERIALIZED (
       |  SELECT DISTINCT t.doc_id, d.b, CAST(1.0 AS DOUBLE) AS x
       |  FROM tokd t JOIN dictw d USING (w)),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM lab),
       |w0 AS MATERIALIZED (
       |  SELECT r.range AS j, CAST(0.0 AS DOUBLE) AS w FROM range($buckets) r),
       |$iterCtes,
       |sc AS MATERIALIZED (
       |  SELECT s.doc_id, round(${sig("s.z")}, 6) AS score
       |  FROM (${zSel(s"w$iters")}) s)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |       CAST(COALESCE(l.nw, 0) AS BIGINT) AS n_words,
       |       CAST(($labelSql) AS BIGINT) AS label,
       |       s.score,
       |       CASE WHEN s.score IS NULL THEN NULL
       |            ELSE CAST(s.score > 0.5 AS BIGINT) END AS predicted
       |FROM documents d LEFT JOIN lab l USING (doc_id)
       |LEFT JOIN sc s USING (doc_id)""".stripMargin
  }

  /** Oracle for q_langid_model (round 14): the one-vs-rest hashed
    * char-n-gram language-ID trainer
    * ([[graft.operators.Classifier.trainLangId]]) replayed end to end —
    * deterministic multi-script fixture, char `gramN`-gram shingle
    * dictionary hashed through the XXH64 chain (bucket = h % buckets,
    * valid because `buckets` divides 2⁶⁴), one [[classifier]]-style
    * delta-rule chain PER LANGUAGE over the training split, argmax
    * scoring of the eval split (ties to the first label = (z DESC, ci)
    * row_number), the stopword-heuristic baseline recomputed on the
    * same split, and the accuracy gate. Every CTE computes the same
    * bits Spark does — the [[classifier]] determinism argument, ×
    * `langs.size` chains. */
  def langIdModel(buckets: Int, iters: Int, lr: String, langs: Seq[String],
                  vocab: Seq[Seq[String]], nWords: Int, gramN: Int): String = {
    require(Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two (so it divides 2^64 and the " +
        s"unsigned-hash %% equals Spark's signed pmod): $buckets")
    val S = "1000000000000.0"
    val nl = langs.size
    val vs = vocab.head.size
    val langsLit = langs.map(l => s"'$l'").mkString("[", ", ", "]")
    val vocabLit = vocab.map(v =>
      v.map(w => s"'$w'").mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val base = "SELECT g, hex(encode(g)) AS hx FROM (SELECT DISTINCT g FROM gr)"
    val (ch, hcol) = hashBytesChain(base, "hx")
    def zOver(feats: String, wTab: String): String =
      s"""SELECT f.doc_id,
         |       CAST(SUM(CAST(round(w.w * f.x * $S, 0) AS BIGINT)) AS DOUBLE) / $S AS z
         |    FROM $feats f JOIN $wTab w ON f.b = w.j
         |    GROUP BY f.doc_id""".stripMargin
    def sig(z: String): String = s"(0.5 + ($z) / (2.0 * (1.0 + abs($z))))"
    val labCtes = langs.zipWithIndex.map { case (k, ci) =>
      s"""lab$ci AS MATERIALIZED (
         |  SELECT doc_id, CASE WHEN lang = '$k' THEN 1.0 ELSE 0.0 END AS y
         |  FROM hist)""".stripMargin
    }.mkString(",\n")
    val trainCtes = langs.indices.map { ci =>
      val chain = (1 to iters).map { k =>
        s"""c${ci}e$k AS MATERIALIZED (
           |  SELECT s.doc_id, ${sig("s.z")} - l.y AS err
           |  FROM (${zOver("featsH", s"c${ci}w${k - 1}")}) s JOIN lab$ci l USING (doc_id)),
           |c${ci}w$k AS MATERIALIZED (
           |  SELECT w.j,
           |         w.w - $lr * (CAST(COALESCE(g.g, 0) AS DOUBLE) / $S)
           |               / (SELECT n FROM nn) AS w
           |  FROM c${ci}w${k - 1} w LEFT JOIN (
           |    SELECT f.b AS j,
           |           SUM(CAST(round(e.err * f.x * $S, 0) AS BIGINT)) AS g
           |    FROM featsH f JOIN c${ci}e$k e USING (doc_id)
           |    GROUP BY f.b) g ON w.j = g.j)""".stripMargin
      }.mkString(",\n")
      s"c${ci}w0 AS (SELECT * FROM w0),\n$chain"
    }.mkString(",\n")
    val zUnion = langs.indices.map { ci =>
      s"SELECT doc_id, $ci AS ci, z FROM (${zOver("featsE", s"c${ci}w$iters")})"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH fx AS MATERIALIZED (
       |  SELECT doc_id,
       |         $langsLit[CAST(doc_id % $nl AS INT) + 1] AS lang,
       |         array_to_string(list_transform(range(0, $nWords), i ->
       |           $vocabLit[CAST(doc_id % $nl AS INT) + 1]
       |             [CAST((doc_id * 31 + i * 7) % $vs AS INT) + 1]), ' ') AS text
       |  FROM documents),
       |tt AS (SELECT doc_id, lower(trim(text)) AS t FROM fx),
       |gr AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), $gramN) AS g
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${gramN - 2})) AS i
       |        FROM tt)),
       |dictg AS MATERIALIZED (
       |  SELECT g, CAST($hcol % $buckets AS BIGINT) AS b FROM (${ch.sql})),
       |feats AS MATERIALIZED (
       |  SELECT DISTINCT gr.doc_id, d.b, CAST(1.0 AS DOUBLE) AS x
       |  FROM gr JOIN dictg d USING (g)),
       |hist AS MATERIALIZED (
       |  SELECT doc_id, lang FROM fx WHERE doc_id % 3 <> 0),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM hist),
       |featsH AS MATERIALIZED (
       |  SELECT f.* FROM feats f JOIN hist USING (doc_id)),
       |ev AS MATERIALIZED (SELECT doc_id, lang FROM fx WHERE doc_id % 3 = 0),
       |featsE AS MATERIALIZED (
       |  SELECT f.* FROM feats f JOIN ev USING (doc_id)),
       |w0 AS MATERIALIZED (
       |  SELECT r.range AS j, CAST(0.0 AS DOUBLE) AS w FROM range($buckets) r),
       |$labCtes,
       |$trainCtes,
       |zs AS MATERIALIZED (
       |  $zUnion),
       |pred AS MATERIALIZED (
       |  SELECT e.doc_id, e.lang, $langsLit[r.ci + 1] AS predicted
       |  FROM (SELECT doc_id, ci, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY z DESC, ci) AS rn FROM zs) r
       |  JOIN ev e USING (doc_id) WHERE r.rn = 1),
       |htk AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN len(trim(lower(text))) = 0
       |         THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(lower(text)),
       |                                 '[ \\t\\n\\x0B\\f\\r]+') END AS t
       |  FROM fx WHERE doc_id % 3 = 0),
       |hv AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(t, x -> list_contains(
       |      ['the','a','an','and','of','to','in','is','it','that'], x))) AS en,
       |    len(list_filter(t, x -> list_contains(
       |      ['le','la','les','de','des','et','un','une','est','que'], x))) AS fr,
       |    len(list_filter(t, x -> list_contains(
       |      ['el','la','los','las','de','y','un','una','es','que'], x))) AS es,
       |    len(list_filter(t, x -> list_contains(
       |      ['der','die','das','und','ein','eine','ist','von','zu','mit'], x))) AS de
       |  FROM htk),
       |hp AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    CASE WHEN greatest(en, fr, es, de) = 0 THEN 'und'
       |         WHEN en = greatest(en, fr, es, de) THEN 'en'
       |         WHEN fr = greatest(en, fr, es, de) THEN 'fr'
       |         WHEN es = greatest(en, fr, es, de) THEN 'es'
       |         ELSE 'de' END AS predicted
       |  FROM hv),
       |acc AS MATERIALIZED (
       |  SELECT round(avg(CASE WHEN p.predicted = p.lang THEN 1.0 ELSE 0.0 END), 6) AS model_acc,
       |         round(avg(CASE WHEN h.predicted = h.lang THEN 1.0 ELSE 0.0 END), 6) AS heur_acc
       |  FROM pred p JOIN hp h USING (doc_id))
       |SELECT p.lang, p.predicted, CAST(count(*) AS BIGINT) AS n,
       |       a.model_acc, a.heur_acc
       |FROM pred p, acc a
       |WHERE a.model_acc > a.heur_acc
       |GROUP BY p.lang, p.predicted, a.model_acc, a.heur_acc""".stripMargin
  }

  /** Oracle for q_image_phash (round 14): the dHash chain replayed
    * arithmetically — per-doc 9×8 pixel grid (multiplicative-hash
    * grays, the planted one-pixel edit on every 10th doc), luma ==
    * gray for a grayscale image ((299+587+114)·g / 1000 = g, exact),
    * one cell per pixel at exactly 9×8, the 64 left<right gradient
    * bits packed row-major as a HUGEINT and wrapped to Spark's SIGNED
    * long, then BRUTE-FORCE Hamming pairs at `maxHamming` — the banded
    * pigeonhole path must reproduce them exactly. Junk (undecodable)
    * docs are excluded on both sides, mirroring the NULL-hash drop. */
  /** Codec fixture rows for q_image_phash (round 15): negative ids so
    * they can never collide with documents; each carries the SAME
    * quadratic-residue gray grid as document `base` (optionally with
    * the one-cell `tweak` perturbation), encoded driver-side as a real
    * PNG / GIF / TIFF (9×8, lossless) or a DC-only constant-block
    * 72×64 baseline JPEG (pixel-exact by construction —
    * [[graft.functions.ImageEncoders.jpegGrayBlocks]]). The oracle
    * replays only the grid arithmetic; the decode roundtrip is the
    * Spark side's burden. `fmt` is ignored by the SQL. */
  final case class PhashFixture(id: Long, base: Long, tweakP: Int,
                                tweakDelta: Int, fmt: String)
  val phashFixtures: Seq[PhashFixture] = Seq(
    PhashFixture(-1002L, 2L, -1, 0, "png"),   // 0-Hamming twin of doc 2
    PhashFixture(-2003L, 3L, -1, 0, "gif"),   // 0-Hamming twin of doc 3
    PhashFixture(-3004L, 4L, -1, 0, "tiff"),  // 0-Hamming twin of doc 4
    PhashFixture(-4007L, 7L, -1, 0, "jpeg"),  // 0-Hamming twin of doc 7
    PhashFixture(-5005L, 5L, -1, 0, "webp"),  // 0-Hamming twin of doc 5 (r16: VP8L)
    PhashFixture(-1102L, 2L, 40, 75, "png"))  // near-dup of doc 2 / -1002

  /** Incremental-screen codec fixtures (r16): (id, base) rows UNIONed
    * into the BATCH side — ids chosen ≡ −1 (mod 4) so both engines
    * route them to the batch (Spark pmod 3, DuckDB −1), bases ≡ 0 so
    * the matching history doc exists. */
  val phashIncFixtures: Seq[(Long, Long, String)] =
    Seq((-6009L, 8L, "webp"))

  def imagePhash(maxHamming: Int): String = {
    // bit (r, c) compares grid cells r*9+c and r*9+c+1 (1-based list
    // indices +1), weighted 2^(r*8+c)
    val bitTerms = (for {
      r <- 0 until 8
      c <- 0 until 8
    } yield {
      val left = r * 9 + c + 1
      val right = left + 1
      val w = java.math.BigInteger.ONE.shiftLeft(r * 8 + c)
      s"(CASE WHEN g[$left] < g[$right] THEN ${w}::HUGEINT ELSE 0::HUGEINT END)"
    }).mkString(" +\n         ")
    val fxRows = phashFixtures
      .map(f => s"(${f.id}, ${f.base}, ${f.tweakP}, ${f.tweakDelta})")
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
       |         doc_id % 10 = 1 AS isdup,
       |         doc_id % 13 = 0 AS junk
       |  FROM documents),
       |px AS MATERIALIZED (
       |  SELECT doc_id, junk,
       |         list_transform(range(0, 72), p ->
       |           (((((base * 131 + p * 197) % 65521) *
       |              ((base * 131 + p * 197) % 65521)) % 65521 + p * 13) % 256 +
       |            CASE WHEN isdup AND p = 0 THEN 60
       |                 WHEN isdup AND p = 40 THEN 75 ELSE 0 END) % 256) AS g
       |  FROM d),
       |fx(doc_id, base, tp, td) AS (VALUES $fxRows),
       |fpx AS (
       |  SELECT doc_id,
       |         list_transform(range(0, 72), p ->
       |           (((((base * 131 + p * 197) % 65521) *
       |              ((base * 131 + p * 197) % 65521)) % 65521 + p * 13) % 256 +
       |            CASE WHEN p = tp THEN td ELSE 0 END) % 256) AS g
       |  FROM fx),
       |apx AS (SELECT doc_id, g FROM px WHERE NOT junk
       |        UNION ALL SELECT doc_id, g FROM fpx),
       |hu AS (
       |  SELECT doc_id,
       |         ($bitTerms) AS h
       |  FROM apx),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN h >= $S63 THEN h - $M64 ELSE h END AS BIGINT) AS s
       |  FROM hu)
       |SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       |       CAST(b.doc_id AS BIGINT) AS id_b,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b
       |  ON a.doc_id < b.doc_id
       | AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin
  }

  /** Oracle for q_incremental_phash (round 15): the q_image_phash
    * pixel/hash chain on the DOC family only (no codec fixtures), then
    * the brute-force CROSS-SPLIT Hamming join — batch (doc_id%4≠0)
    * against history (doc_id%4=0). The operator's partial-probe banded
    * path (maxHamming+1 of 8 band partitions) must reproduce it
    * exactly: partial-probe pigeonhole is an exactness claim, and this
    * oracle is its check. */
  // -------------------------------------------------------------------
  // Audio energy-envelope fingerprints (round 16): the q_image_phash
  // structure on [[graft.functions.AudioKernels.energyDhash64]] — 130
  // 8-bit WAV samples per doc, 65 two-sample frames, mean |16-bit|
  // amplitude per frame (exact integer floor), bit i = e[i] < e[i+1].
  // -------------------------------------------------------------------
  private val audioEnergyList: String =
    "list_transform(range(0, 65), f -> " +
      "(abs(g[2*f+1] - 128) * 256 + abs(g[2*f+2] - 128) * 256) // 2)"

  private val audioBitTerms: String = (0 until 64).map { i =>
    val w = java.math.BigInteger.ONE.shiftLeft(i)
    s"(CASE WHEN e[${i + 1}] < e[${i + 2}] THEN ${w}::HUGEINT " +
      "ELSE 0::HUGEINT END)"
  }.mkString(" +\n         ")

  private def audioSampleList: String =
    """list_transform(range(0, 130), p ->
      |           (((((base * 131 + p * 197) % 65521) *
      |              ((base * 131 + p * 197) % 65521)) % 65521 + p * 13) % 256 +
      |            CASE WHEN isdup AND p = 0 THEN 60
      |                 WHEN isdup AND p = 80 THEN 75 ELSE 0 END) % 256""".stripMargin + ") AS g"

  /** Oracle for q_audio_neardup: per-doc sample/energy/fingerprint
    * chain, then the brute-force Hamming pair join the banded operator
    * must reproduce exactly (pigeonhole exactness check). */
  def audioNearDup(maxHamming: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
       |         doc_id % 10 = 1 AS isdup,
       |         doc_id % 13 = 0 AS junk
       |  FROM documents),
       |px AS MATERIALIZED (
       |  SELECT doc_id, junk, $audioSampleList
       |  FROM d),
       |en AS (
       |  SELECT doc_id, $audioEnergyList AS e
       |  FROM px WHERE NOT junk),
       |hu AS (
       |  SELECT doc_id,
       |         ($audioBitTerms) AS h
       |  FROM en),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN h >= $S63 THEN h - $M64 ELSE h END AS BIGINT) AS s
       |  FROM hu)
       |SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       |       CAST(b.doc_id AS BIGINT) AS id_b,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b
       |  ON a.doc_id < b.doc_id
       | AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin

  /** Oracle for q_incremental_audio: same chain, cross-split join —
    * batch (doc_id%4≠0) against history (doc_id%4=0). */
  def audioIncremental(maxHamming: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
       |         doc_id % 10 = 1 AS isdup,
       |         doc_id % 13 = 0 AS junk
       |  FROM documents),
       |px AS MATERIALIZED (
       |  SELECT doc_id, junk, $audioSampleList
       |  FROM d),
       |en AS (
       |  SELECT doc_id, $audioEnergyList AS e
       |  FROM px WHERE NOT junk),
       |hu AS (
       |  SELECT doc_id,
       |         ($audioBitTerms) AS h
       |  FROM en),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN h >= $S63 THEN h - $M64 ELSE h END AS BIGINT) AS s
       |  FROM hu)
       |SELECT CAST(a.doc_id AS BIGINT) AS new_id,
       |       CAST(b.doc_id AS BIGINT) AS hist_id,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b
       |  ON a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
       | AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin

  /** Oracle for q_video_neardup (round 16): 68 per-frame DC values →
    * decoded lumas (128 + v, exact for flat frames) → the 65-position
    * sampled envelope (pos i = i·68/65) → 64 gradient bit terms →
    * brute-force Hamming pair join. */
  def videoNearDup(maxHamming: Int): String = {
    val bits = (0 until 64).map { i =>
      val w = java.math.BigInteger.ONE.shiftLeft(i)
      s"(CASE WHEN e[${i + 1}] < e[${i + 2}] THEN ${w}::HUGEINT " +
        "ELSE 0::HUGEINT END)"
    }.mkString(" +\n         ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
       |         doc_id % 10 = 1 AS isdup,
       |         doc_id % 9 = 0 AS junk
       |  FROM documents),
       |vf AS MATERIALIZED (
       |  SELECT doc_id,
       |         list_transform(range(0, 68), f ->
       |           128 + 32 + (((((base * 131 + f * 197) % 65521) *
       |              ((base * 131 + f * 197) % 65521)) % 65521 + f * 13) % 32 +
       |            CASE WHEN isdup AND (f = 0 OR f = 40) THEN 8
       |                 ELSE 0 END) % 32) AS m
       |  FROM d WHERE NOT junk),
       |en AS (
       |  SELECT doc_id,
       |         list_transform(range(0, 65), i -> m[(i * 68) // 65 + 1]) AS e
       |  FROM vf),
       |hu AS (
       |  SELECT doc_id,
       |         ($bits) AS h
       |  FROM en),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN h >= $S63 THEN h - $M64 ELSE h END AS BIGINT) AS s
       |  FROM hu)
       |SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       |       CAST(b.doc_id AS BIGINT) AS id_b,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b
       |  ON a.doc_id < b.doc_id
       | AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin
  }

  def imagePhashIncremental(maxHamming: Int): String = {
    val bitTerms = (for {
      r <- 0 until 8
      c <- 0 until 8
    } yield {
      val left = r * 9 + c + 1
      val right = left + 1
      val w = java.math.BigInteger.ONE.shiftLeft(r * 8 + c)
      s"(CASE WHEN g[$left] < g[$right] THEN ${w}::HUGEINT ELSE 0::HUGEINT END)"
    }).mkString(" +\n         ")
    val incFx = phashIncFixtures
      .map { case (id, base, _) => s"($id, $base, false, false)" }
      .mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
       |         doc_id % 10 = 1 AS isdup,
       |         doc_id % 13 = 0 AS junk
       |  FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES $incFx) fx(doc_id, base, isdup, junk)),
       |px AS MATERIALIZED (
       |  SELECT doc_id, junk,
       |         list_transform(range(0, 72), p ->
       |           (((((base * 131 + p * 197) % 65521) *
       |              ((base * 131 + p * 197) % 65521)) % 65521 + p * 13) % 256 +
       |            CASE WHEN isdup AND p = 0 THEN 60
       |                 WHEN isdup AND p = 40 THEN 75 ELSE 0 END) % 256) AS g
       |  FROM d),
       |hu AS (
       |  SELECT doc_id,
       |         ($bitTerms) AS h
       |  FROM px WHERE NOT junk),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN h >= $S63 THEN h - $M64 ELSE h END AS BIGINT) AS s
       |  FROM hu)
       |SELECT CAST(a.doc_id AS BIGINT) AS new_id,
       |       CAST(b.doc_id AS BIGINT) AS hist_id,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b
       |  ON a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
       | AND bit_count(xor(a.s, b.s)) <= $maxHamming""".stripMargin
  }

  // -------------------------------------------------------------------
  // Deterministic sampling: both operators draw from
  // xxhash64(struct(row), seed) — Spark folds the struct FIELDS in
  // order through the running hash (long -> hashLong, string ->
  // hashBytes), then the seed literal as one more long; a NULL field
  // is SKIPPED (hash unchanged), which the guard levels below model
  // so a regenerated corpus with NULL lang/n_chars still compares.
  // -------------------------------------------------------------------

  /** Chain computing the signed row hash `sh` for the sampling
    * projection; returns the full SELECT. */
  private def sampleHashSql(seed: Long): String = {
    val ch = new Chain(
      """SELECT doc_id, lang, n_chars, hex(encode(lang)) AS hx
        |FROM documents""".stripMargin)
    val h1 = hashLong(ch, "doc_id", "42", "f1")
    val hLang = hashBytesLevels(ch, "hx", h1, "f2")
    // NULL lang: the whole byte chain is NULL; fall back to the running
    // hash, exactly Spark's null-field skip
    val h2 = ch.lvl("f2g", s"CASE WHEN lang IS NULL THEN $h1 ELSE $hLang END")
    val hChars = hashLong(ch, "n_chars", h2, "f3")
    val h3 = ch.lvl("f3g", s"CASE WHEN n_chars IS NULL THEN $h2 ELSE $hChars END")
    val h = hashLong(ch, seed.toString, h3, "f4")
    val sh = ch.lvl("sh",
      s"CAST(CASE WHEN $h >= $S63 THEN $h - $M64 ELSE $h END AS BIGINT)")
    s"SELECT doc_id, lang, n_chars, $sh AS sh FROM (${ch.sql})"
  }

  /** Oracle for q_sample_group: Ops.samplePerGroup = the n
    * hash-smallest rows per group, SIGNED long order, row-content
    * tie-break. */
  def sampleGroup(n: Int, seed: Long): String =
    s"""WITH h AS MATERIALIZED (${sampleHashSql(seed)})
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(n_chars AS BIGINT) AS n_chars
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY lang
       |        ORDER BY sh, doc_id, n_chars) AS rn FROM h)
       |WHERE rn <= $n""".stripMargin

  /** Oracle for q_sample_bernoulli: Ops.deterministicSample = keep a
    * row iff hash mod 2^32 < fraction * 2^32 (2^32 divides 2^64, so
    * the signed/unsigned distinction vanishes). `h` MUST be
    * MATERIALIZED: an inlined CTE lets DuckDB push the WHERE down
    * through the ~80 chained projections, substituting the hash
    * expression at every level — planning explodes (observed: 22 GB,
    * no termination). Materialization fences the filter. */
  def sampleBernoulli(bound: Long, seed: Long): String =
    s"""WITH h AS MATERIALIZED (${sampleHashSql(seed)})
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(n_chars AS BIGINT) AS n_chars
       |FROM h
       |WHERE ((sh % 4294967296) + 4294967296) % 4294967296 < $bound""".stripMargin

  /** Oracle for q_sample_weighted: Ops.sampleWeighted = the k smallest
    * exponential-race keys `-ln(u)/w`, w = n_chars. The hash chain and
    * the `(h mod 2^32 + 1) / (2^32 + 1)` uniform are integer/IEEE-exact
    * across engines; `ln` may differ by ~1 ulp, which flips the
    * selection only if two DIFFERENT rows' keys collide within ~2^-52
    * relative — OpsSpec measures the realized adjacent-key margins.
    * Tie-break: doc_id is unique and non-null, so `ORDER BY key,
    * doc_id` here equals the operator's full-row-struct tie-break
    * (doc_id is the struct's first field). */
  def sampleWeighted(k: Int, seed: Long): String =
    s"""WITH h AS MATERIALIZED (${sampleHashSql(seed)})
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(n_chars AS BIGINT) AS n_chars
       |FROM (
       |  SELECT *,
       |    (-ln((((sh % 4294967296) + 4294967296) % 4294967296 + 1)
       |         / 4294967297.0)) / n_chars AS race_key
       |  FROM h
       |  WHERE n_chars IS NOT NULL AND n_chars > 0
       |  ORDER BY race_key, doc_id
       |  LIMIT $k
       |)""".stripMargin

  /** Oracle for q_sample_weighted_group: Ops.sampleWeightedPerGroup =
    * the n smallest race keys PER lang (the bounded collect_smallest
    * form). Same race arithmetic and ulp analysis as
    * [[sampleWeighted]]; the per-group selection replays as a
    * partitioned row_number, tie-broken by doc_id (unique, non-null —
    * equals the operator's struct order whose first field is doc_id). */
  def sampleWeightedGroup(n: Int, seed: Long): String =
    s"""WITH h AS MATERIALIZED (${sampleHashSql(seed)}),
       |r AS (
       |  SELECT *,
       |    (-ln((((sh % 4294967296) + 4294967296) % 4294967296 + 1)
       |         / 4294967297.0)) / n_chars AS race_key
       |  FROM h
       |  WHERE n_chars IS NOT NULL AND n_chars > 0
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(n_chars AS BIGINT) AS n_chars
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY lang ORDER BY race_key, doc_id) AS rn FROM r)
       |WHERE rn <= $n""".stripMargin

  // -------------------------------------------------------------------
  // BPE tokenizer: the training loop is string/integer-exact (word
  // counts, argmax with byte-order tie-break, greedy merge passes), so
  // DuckDB replays it generation by generation: w0..wk are dictionary
  // states, m1..mk the per-generation argmax merges. The merge-apply
  // step is the SAME doubled-separator replace() the Spark trainer
  // runs — one shared trick, two engines, bit-identical results.
  // -------------------------------------------------------------------

  private def bpeChain(k: Int, cap: Option[Int] = None): String = {
    val sep = "chr(10)"
    val sep2 = "chr(10)||chr(10)"
    // the top-K dictionary cap replays Spark's deterministic
    // orderBy(cnt DESC, w ASC).limit(cap) — w is unique per row, so
    // the order is total and the capped set is exact, not sampled
    val capClause = cap.map(n => s" ORDER BY cnt DESC, w LIMIT $n").getOrElse("")
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT w, count(*) AS cnt,
         |         $sep2 || array_to_string([substr(w, i, 1) for i in range(1, length(w) + 1)], $sep2) || $sep2 AS r
         |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS w
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE length(w) > 0 GROUP BY w$capClause)""".stripMargin
    val gens = (1 to k).map { g =>
      s"""p$g AS (
         |  SELECT p[1] AS a, p[2] AS b, sum(cnt) AS c FROM (
         |    SELECT cnt, unnest([[s[i], s[i+1]] for i in range(1, len(s))]) AS p
         |    FROM (SELECT cnt, list_filter(string_split(r, $sep2), x -> x <> '') AS s
         |          FROM w${g - 1}))
         |  GROUP BY a, b),
         |m$g AS (SELECT a, b FROM p$g ORDER BY c DESC, a, b LIMIT 1),
         |w$g AS MATERIALIZED (
         |  SELECT w, cnt,
         |         CASE WHEN m.a IS NULL THEN r
         |              ELSE replace(r, $sep || m.a || $sep2 || m.b || $sep,
         |                           $sep || m.a || m.b || $sep) END AS r
         |  FROM w${g - 1} LEFT JOIN m$g m ON TRUE)""".stripMargin
    }
    (w0 +: gens).mkString(",\n")
  }

  /** Oracle for q_bpe_train: the ranked merge table. */
  def bpeTrain(k: Int): String = {
    val parts = (1 to k).map(g =>
      s"SELECT CAST($g AS BIGINT) AS rank, a, b FROM m$g")
    s"WITH ${bpeChain(k)}\n${parts.mkString("\nUNION ALL\n")}"
  }

  /** Oracle for q_bpe_train_capped: the same generation-by-generation
    * replay, but over the top-`cap` dictionary — the 100 TB trainer
    * configuration (Zipf-tail cap) is itself hash-checked, not just the
    * exact-classic loop. */
  def bpeTrainCapped(k: Int, cap: Int): String = {
    val parts = (1 to k).map(g =>
      s"SELECT CAST($g AS BIGINT) AS rank, a, b FROM m$g")
    s"WITH ${bpeChain(k, Some(cap))}\n${parts.mkString("\nUNION ALL\n")}"
  }

  /** Oracle for q_bpe_encode: per-document word and token counts under
    * the trained merges — encode replayed as a dictionary join (every
    * corpus word is in the dict by construction; zero-word documents
    * keep a 0/0 row via the LEFT JOIN). */
  def bpeEncode(k: Int): String =
    s"""WITH ${bpeChain(k)},
       |tok AS (
       |  SELECT doc_id,
       |         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |agg AS (
       |  SELECT t.doc_id, count(*) AS nw,
       |         sum(len(list_filter(string_split(d.r, chr(10)||chr(10)), x -> x <> ''))) AS nt
       |  FROM tok t JOIN w$k d USING (w) GROUP BY t.doc_id)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |       CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(a.nt, 0) AS BIGINT) AS n_tokens
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // -------------------------------------------------------------------
  // SimHash: Spark Murmur3_x86_32 (seeds 0x9747b28c / 0x85ebca6b) over
  // lowercased whitespace tokens, bit votes, sign sketch. All 32-bit
  // modular arithmetic — products of two 32-bit values fit HUGEINT
  // directly, no limb split needed.
  // -------------------------------------------------------------------

  private val M32 = "4294967296" // 2^32
  private val MC1 = "3432918353" // 0xcc9e2d51
  private val MC2 = "461845907"  // 0x1b873593

  private def m32(a: String, b: String): String = s"((($a) * ($b)) % $M32)"

  private def rot32(x: String, r: Int): String = {
    val lo = 1L << (32 - r)
    s"((($x) % $lo) * ${1L << r} + ($x) // $lo)"
  }

  /** One murmur3 round: h = mixH1(h, mixK1(w)), guarded (pass-through
    * when the token has no byte/word at this position). */
  private def murmurRound(ch: Chain, h: String, w: String, guard: String,
                          p: String): String = {
    val k1 = ch.lvl(s"${p}k1", m32(w, MC1))
    val k2 = ch.lvl(s"${p}k2", rot32(k1, 15))
    val k3 = ch.lvl(s"${p}k3", m32(k2, MC2))
    val h1 = ch.lvl(s"${p}h1", xor64(h, k3))
    val h2 = ch.lvl(s"${p}h2", rot32(h1, 13))
    val h3 = ch.lvl(s"${p}h3", s"((${m32(h2, "5")} + 3864292196) % $M32)")
    ch.lvl(s"${p}h", s"CASE WHEN $guard THEN $h3 ELSE $h END")
  }

  /** Spark Murmur3_x86_32.hashUnsafeBytes over the token bytes (hex in
    * `hxp`, byte count in `nn`): LE 4-byte words, then each tail byte
    * SIGN-EXTENDED and fed through a full mix round (Spark's deviation
    * from reference murmur3), then fmix. Sized for `maxBlocks` words —
    * the corpus' longest whitespace token is 8 bytes; 32 bytes of
    * headroom keeps the oracle honest if the generator's vocabulary
    * grows. */
  private def murmurChain(ch: Chain, seed: Long, maxBlocks: Int,
                          p: String): String = {
    var h = ch.lvl(s"${p}s", java.lang.Integer.toUnsignedLong(seed.toInt).toString)
    for (blk <- 0 until maxBlocks) {
      val w = ch.lvl(s"${p}w$blk", (0 until 4).map { j =>
        s"${byteAt("hxp", s"${4 * blk + j + 1}")} * ${1L << (8 * j)}"
      }.mkString(" + "))
      h = murmurRound(ch, h, w, s"nn >= ${4 * (blk + 1)}", s"${p}b$blk")
    }
    for (j <- 0 until 3) {
      val raw = ch.lvl(s"${p}tr$j", byteAt("hxp", s"4 * (nn // 4) + ${j + 1}"))
      val sb = ch.lvl(s"${p}ts$j",
        s"CASE WHEN $raw >= 128 THEN $raw + 4294967040 ELSE $raw END")
      h = murmurRound(ch, h, sb, s"nn % 4 > $j", s"${p}t$j")
    }
    val f0 = ch.lvl(s"${p}f0", xor64(h, "nn"))
    val f1 = ch.lvl(s"${p}f1", xor64(f0, s"(($f0) // 65536)"))
    val f2 = ch.lvl(s"${p}f2", m32(f1, "2246822507")) // 0x85ebca6b
    val f3 = ch.lvl(s"${p}f3", xor64(f2, s"(($f2) // 8192)"))
    val f4 = ch.lvl(s"${p}f4", m32(f3, "3266489909")) // 0xc2b2ae35
    ch.lvl(s"${p}f5", xor64(f4, s"(($f4) // 65536)"))
  }

  /** (doc_id, sk) — the exact 64-bit SimHash sketch per document,
    * mirroring SimHash.simhashText64 (lowercase, ASCII-whitespace
    * tokenize, empty tokens skipped, every occurrence votes). */
  private def simhashSketchSql(maxBlocks: Int): String = {
    val base =
      s"""SELECT doc_id, hex(encode(t)) AS hx FROM (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
         |  FROM documents WHERE text IS NOT NULL)
         |WHERE length(t) > 0""".stripMargin
    // DuckDB rpad TRUNCATES longer strings, so a token over 4*maxBlocks
    // bytes would silently hash wrong (and its tail-byte reads would
    // index past the padded window). Round 9 guarded this with error(),
    // which killed the WHOLE oracle query on one bad token; the guard is
    // now row-scoped (round-10 directive): the token carries an `odd`
    // (out-of-domain) flag, its document's sketch becomes NULL, and the
    // correctness diff shows exactly the affected rows — NULL `sk` in
    // this oracle always means "token > ${4 * maxBlocks} bytes after a
    // corpus regeneration; widen maxBlocks at the q_dedup_simhash call
    // site" rather than a computed value. Tail-byte reads stay in-window
    // because nn is clamped for flagged rows (their hash is discarded)
    // AND the pad carries 4 spare zero bytes: the tail-byte levels are
    // computed unconditionally (the guards only SELECT between values),
    // so a full-width token (nn = 4*maxBlocks) reads tail positions
    // 4*maxBlocks+1..3 — off the end of an exact-width pad, where
    // substr returns '' and '0x'||'' kills the query (r10 audit find).
    val ch = new Chain(
      s"SELECT doc_id, length(hx) > ${8 * maxBlocks} AS odd, " +
        s"rpad(hx, ${8 * maxBlocks + 8}, '0') AS hxp, " +
        s"least(CAST(length(hx) // 2 AS HUGEINT), ${4 * maxBlocks}) AS nn FROM ($base)")
    val lo = murmurChain(ch, 0x9747b28cL, maxBlocks, "lo")
    val hi = murmurChain(ch, 0x85ebca6bL, maxBlocks, "hi")
    val h64 = ch.lvl("h64", s"($hi * $M32 + $lo)")
    // bit votes: +1/-1 per token occurrence per bit; sign -> sketch bit.
    // Token-less documents (non-null whitespace-only text) sketch to 0
    // in the kernel and DO pair with each other at Hamming 0, so the
    // LEFT JOIN keeps them with coalesce(0) — dropping them would turn
    // a future corpus regeneration containing empty texts into a false
    // red (NULL-text docs stay excluded: their null sketch survives no
    // bit_count verification on the Spark side either)
    s"""SELECT d.doc_id,
       |       CASE WHEN k.anyodd THEN NULL
       |            ELSE coalesce(k.sk, CAST(0 AS HUGEINT)) END AS sk
       |FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
       |LEFT JOIN (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN v > 0 THEN power(2, b)::HUGEINT ELSE 0 END)
       |              AS HUGEINT) AS sk,
       |         bool_or(anyodd) AS anyodd
       |  FROM (
       |    SELECT doc_id, b,
       |           sum(CASE WHEN ($h64 // power(2, b)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v,
       |           bool_or(odd) AS anyodd
       |    FROM (${ch.sql}), (SELECT unnest(range(64)) AS b)
       |    GROUP BY doc_id, b)
       |  GROUP BY doc_id) k USING (doc_id)""".stripMargin
  }

  /** Oracle for q_dedup_simhash. The engine's banding is provably
    * COMPLETE for maxHamming <= bands-1 and the candidates are
    * re-verified with bit_count, so its output equals the all-pairs
    * Hamming <= 3 join over exact sketches — which is what this
    * recomputes (no bucket machinery to model; a bucket-cap drop or a
    * broken band split on the Spark side surfaces as a row mismatch).
    * The recall constant is 1.0: the in-plan gate either passes at
    * exactly 1.0 or empties the Spark side, which the compare flags.
    *
    * Domain invariant: whitespace tokens <= 32 bytes (maxBlocks = 8
    * murmur words of 4 bytes). The Spark kernel has no such limit; a
    * regenerated corpus exceeding it fails ROW-SCOPED (round 10 — the
    * round-9 error() guard killed the whole oracle query on one bad
    * token): the affected document's sketch is NULL, it drops out of
    * the pair join, and the correctness diff shows exactly the pairs
    * involving that document as Spark-side-only rows — at which point
    * bump maxBlocks here, which generalizes to any width. */
  lazy val dedupSimhash: String = {
    val sk = simhashSketchSql(8)
    s"""WITH sk AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(CASE WHEN sk >= $S63 THEN sk - $M64 ELSE sk END AS BIGINT) AS s
       |  FROM ($sk))
       |SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       |       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming,
       |       round(1.0, 6) AS recall
       |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= 3""".stripMargin
  }

  // -------------------------------------------------------------------
  // ANN family (q_ann_lsh / q_ann_ivf / q_embedding_neardup) — oracled
  // since round 9 on the strength of tools/ann_margin_audit.py: every
  // float decision the three queries make was measured at sf0.01 and
  // sits 8-10 ORDERS OF MAGNITUDE above any summation-order noise
  // (min hyperplane |projection| 5.0e-5 / 4.1e-5 vs any-order error
  // bound 1e-13; min Lloyd assignment gap 2.3e-4 and probe-cut gap
  // 2.6e-3 vs mean-order error 3e-14; min |round(cos,6) - 0.4|
  // threshold margin 1.3e-4; float32-vs-float64 sign flips: ZERO).
  // So the candidate SETS are engine-independent on this data, and
  // cosine VALUES agree at round(·,6) exactly as q_ann_brute's green
  // oracle already demonstrates. The hyperplane coefficients are
  // xxh64-derived CONSTANTS (independent of the data), computed here
  // in the JVM with the same XXH64.hashLong the kernel uses and
  // spliced as shortest-round-trip double literals (exact by IEEE
  // round-tripping). Dimension guard: coefficient vectors are sized
  // MaxDim wide and sliced to len(v); a wider embedding after a corpus
  // regeneration raises a NAMED DuckDB error, not a silent mismatch.
  // -------------------------------------------------------------------

  /** Widest embedding the spliced hyperplanes support (testdata is 64). */
  private val MaxDim = 128

  /** (bit, coefs) rows of the random-hyperplane family `seed` — exact
    * doubles of VectorKernels.lshBucket's h(b, i) ∈ [-1, 1]. A non-empty
    * `rowPrefix` (e.g. `"2, "`) prepends extra leading columns (the
    * band id for the multi-band caller). */
  private def hyperplaneRows(nBits: Int, seed: Long,
                             rowPrefix: String = ""): String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val hSeed = XXH64.hashLong(seed, 42L)
    (0 until nBits).map { b =>
      val hb = XXH64.hashLong(b.toLong, hSeed)
      val coefs = (0 until MaxDim).map { i =>
        java.lang.Double.toString(
          XXH64.hashLong(i.toLong, hb).toDouble / Long.MaxValue.toDouble)
      }
      s"($rowPrefix$b, [${coefs.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
  }

  /** Cast-to-double embedding base with the dimension guard. */
  private def embBase: String =
    s"""SELECT vec_id,
       |       CASE WHEN len(embedding) > $MaxDim
       |            THEN CAST(error('graft oracle: embedding dim ' || len(embedding) || ' exceeds the spliced hyperplane width $MaxDim — regenerate OracleSqlGen.MaxDim') AS DOUBLE[])
       |            ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
       |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin

  /** l2-normalized vectors — VectorKernels.l2Normalize's float path
    * (norm over the double-widened floats; zero vector passes through). */
  private def unitCte: String =
    s"""unit AS MATERIALIZED (
       |  SELECT vec_id, CASE WHEN nrm = 0 THEN v
       |                      ELSE list_transform(v, x -> x / nrm) END AS u
       |  FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       |        FROM ($embBase)))""".stripMargin

  /** recall-gate tail shared by the three ANN oracles: `outCte` rows ×
    * the measured recall vs `truthCte` (query-key pair sets), emitted
    * only when the UNROUNDED recall clears `floor` — exactly
    * Ops.recallGate (vacuous 1.0 on empty truth; reported column
    * rounded to 6). */
  private def recallTail(outCte: String, truthCte: String,
                         keyA: String, keyB: String, floor: Double,
                         selectCols: String): String =
    s"""rc AS (
       |  SELECT coalesce(CAST(sum(hit) AS DOUBLE) / nullif(CAST(count(*) AS DOUBLE), 0), 1.0) AS r
       |  FROM (SELECT CASE WHEN o.$keyA IS NOT NULL THEN 1 ELSE 0 END AS hit
       |        FROM $truthCte t
       |        LEFT JOIN (SELECT DISTINCT $keyA, $keyB FROM $outCte) o
       |        ON o.$keyA = t.$keyA AND o.$keyB = t.$keyB))
       |SELECT $selectCols, round(rc.r, 6) AS recall
       |FROM $outCte, rc WHERE rc.r >= $floor""".stripMargin

  /** Oracle for q_ann_lsh: 4-bit random-hyperplane buckets over the RAW
    * embeddings (sign(proj) is scale-invariant; the kernel buckets the
    * un-normalized column), multi-probe = the exact bucket plus every
    * 1-bit flip, exact rounded cosine re-rank (list_cosine_similarity,
    * the float path q_ann_brute's green oracle established), top-5 per
    * query with ties to the smaller corpus id, recall-gated at 0.4
    * against the brute-force truth. */
  lazy val annLsh: String = {
    val nBits = 4
    val probes = (0 until nBits).map(b => s"xor(qb, ${1L << b})")
      .mkString("qb, ", ", ", "")
    s"""WITH emb AS MATERIALIZED ($embBase),
       |hp(bit, coefs) AS (VALUES
       |    ${hyperplaneRows(nBits, 42L)}),
       |bkt AS MATERIALIZED (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN list_dot_product(v, coefs[1:len(v)]) >= 0
       |                       THEN 1 << bit ELSE 0 END) AS BIGINT) AS b
       |  FROM emb, hp GROUP BY vec_id),
       |qbase AS (SELECT vec_id AS qid, b AS qb FROM bkt WHERE vec_id < 16),
       |cand AS (
       |  SELECT q.qid AS query_id, c.vec_id AS corpus_id,
       |         round(list_cosine_similarity(qe.v, ce.v), 6) AS cosine
       |  FROM (SELECT qid, unnest([$probes]) AS b
       |        FROM qbase) q
       |  JOIN bkt c USING (b)
       |  JOIN emb qe ON qe.vec_id = q.qid
       |  JOIN emb ce ON ce.vec_id = c.vec_id
       |  WHERE q.qid <> c.vec_id),
       |top5 AS MATERIALIZED (
       |  SELECT CAST(query_id AS BIGINT) AS query_id,
       |         CAST(corpus_id AS BIGINT) AS corpus_id, cosine,
       |         CAST(rn AS BIGINT) AS rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, corpus_id) AS rn FROM cand)
       |  WHERE rn <= 5),
       |truth AS MATERIALIZED (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT qe.vec_id AS query_id, ce.vec_id AS corpus_id,
       |           row_number() OVER (PARTITION BY qe.vec_id
       |             ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC,
       |                      ce.vec_id) AS rn
       |    FROM emb qe, emb ce
       |    WHERE qe.vec_id < 16 AND qe.vec_id <> ce.vec_id)
       |  WHERE rn <= 5),
       |${recallTail("top5", "truth", "query_id", "corpus_id", 0.4,
          "top5.query_id, top5.corpus_id, top5.cosine, top5.rank")}""".stripMargin
  }

  /** The deterministic Lloyd chain c0..c`iters` over `unit` —
    * Similarity.kmeansCentroids replayed: init = the `nCent` lowest-id
    * unit vectors (cid = 1-based rank), assignment by max dot with
    * ties to the smaller cid, per-dim mean + renormalize, an empty
    * centroid keeps its previous position. Spark computes the means
    * via reduceByKey (combine order scheduling-dependent, ±1e-14);
    * the audited assignment margins (≥ 2.3e-4 every iteration) make
    * every engine's assignment SETS identical, so any summation order
    * yields the same chain of assignments and centroids within 1e-13
    * — far inside the 6-decimal rounding tolerance of the scores. */
  private def lloydChain(nCent: Int, iters: Int, src: String = "unit"): String = {
    val c0 =
      s"""c0 AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cid, u
         |  FROM (SELECT vec_id, u FROM $src ORDER BY vec_id LIMIT $nCent))""".stripMargin
    val gens = (1 to iters).map { g =>
      s"""a$g AS (
         |  SELECT vec_id, u, cid FROM (
         |    SELECT t.vec_id, t.u, c.cid,
         |           row_number() OVER (PARTITION BY t.vec_id
         |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
         |    FROM $src t, c${g - 1} c) WHERE rn = 1),
         |m$g AS (
         |  SELECT cid, list(s / n ORDER BY i) AS mean
         |  FROM (SELECT cid, i, sum(u[i]) AS s, count(*) AS n
         |        FROM a$g, (SELECT unnest(range(1, (SELECT max(len(u)) FROM $src) + 1)) AS i)
         |        GROUP BY cid, i)
         |  GROUP BY cid),
         |c$g AS MATERIALIZED (
         |  SELECT p.cid,
         |         CASE WHEN m.mean IS NULL THEN p.u
         |              WHEN m.mnrm = 0 THEN m.mean
         |              ELSE list_transform(m.mean, x -> x / m.mnrm) END AS u
         |  FROM c${g - 1} p
         |  LEFT JOIN (SELECT cid, mean, sqrt(list_dot_product(mean, mean)) AS mnrm
         |             FROM m$g) m USING (cid))""".stripMargin
    }
    (c0 +: gens).mkString(",\n")
  }

  /** Oracle for q_ann_ivf: the full IVF-Flat path — 16-centroid Lloyd
    * chain (3 iterations), corpus assigned to its top-1 centroid,
    * queries probing their top-2 lists, exact rounded unit-dot re-rank
    * (the kernel scores dot of l2-normalized vectors), top-5, recall
    * ≥ 0.7 vs the brute-force truth. */
  lazy val annIvf: String = {
    val (nCent, iters, nProbes) = (16, 3, 2)
    s"""WITH emb AS MATERIALIZED ($embBase),
       |$unitCte,
       |${lloydChain(nCent, iters)},
       |ca AS (
       |  SELECT vec_id, u, cid FROM (
       |    SELECT t.vec_id, t.u, c.cid,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM unit t, c$iters c) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id, u, cid FROM (
       |    SELECT t.vec_id, t.u, c.cid,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM unit t, c$iters c WHERE t.vec_id < 16) WHERE rn <= $nProbes),
       |cand AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |         round(list_dot_product(q.u, c.u), 6) AS cosine
       |  FROM qprobe q JOIN ca c USING (cid)
       |  WHERE q.vec_id <> c.vec_id),
       |top5 AS MATERIALIZED (
       |  SELECT CAST(query_id AS BIGINT) AS query_id,
       |         CAST(corpus_id AS BIGINT) AS corpus_id, cosine,
       |         CAST(rn AS BIGINT) AS rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, corpus_id) AS rn FROM cand)
       |  WHERE rn <= 5),
       |truth AS MATERIALIZED (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT qe.vec_id AS query_id, ce.vec_id AS corpus_id,
       |           row_number() OVER (PARTITION BY qe.vec_id
       |             ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC,
       |                      ce.vec_id) AS rn
       |    FROM emb qe, emb ce
       |    WHERE qe.vec_id < 16 AND qe.vec_id <> ce.vec_id)
       |  WHERE rn <= 5),
       |${recallTail("top5", "truth", "query_id", "corpus_id", 0.7,
          "top5.query_id, top5.corpus_id, top5.cosine, top5.rank")}""".stripMargin
  }

  /** Oracle for q_ann_ivfpq (round 12): the full IVF-PQ pipeline —
    * coarse 16-centroid Lloyd chain (3 iterations, shared with
    * [[annIvf]]), per-vector residual vs the assigned centroid, a
    * 4-subspace × 8-codeword product-quantizer trained by 2 plain-L2
    * Lloyd iterations over residual slices (assignment = argmax
    * dot−½‖w‖² with ties to the smaller code — the EXACT expression
    * `VectorKernels.pqEncode` evaluates), ADC scoring
    * (q·c_list + Σ_m q_sub·w) rounded to 6 before the top-`rerank`
    * shortlist cut, exact unit-dot re-rank to top-5, recall-gated vs
    * brute force. Sound because every float decision's margin is
    * measured far above summation-order noise: SimilaritySpec's audit
    * reads min assignment margin 8.3e-6 and min rounding-boundary gap
    * 2.2e-10 absolute vs ~1e-13 noise (the r9 audit pattern). Subspace
    * geometry is derived from the data (`dims` CTE), so a testdata
    * regeneration with a new dim keeps the oracle aligned with the
    * engine as long as dim % 4 == 0. */
  lazy val annIvfPq: String = {
    val (nCent, iters, nProbes) = (16, 3, 2)
    val (m, nCodes, pqIters, rerank, floor) = (4, 8, 2, 24, 0.4)
    val pqGens = (1 to pqIters).map { g =>
      s"""pa$g AS (
         |  SELECT vec_id, m, sv, code FROM (
         |    SELECT t.vec_id, t.m, t.sv, w.code,
         |           row_number() OVER (PARTITION BY t.vec_id, t.m
         |             ORDER BY list_dot_product(t.sv, w.w)
         |                      - 0.5 * list_dot_product(w.w, w.w) DESC,
         |                      w.code) AS rn
         |    FROM rsub t JOIN pq${g - 1} w USING (m)) WHERE rn = 1),
         |pm$g AS (
         |  SELECT m, code, list(s / n ORDER BY i) AS mean
         |  FROM (SELECT m, code, i, sum(sv[i]) AS s, count(*) AS n
         |        FROM pa$g, (SELECT unnest(range(1, 1 + (SELECT sub FROM dims))) AS i)
         |        GROUP BY m, code, i)
         |  GROUP BY m, code),
         |pq$g AS MATERIALIZED (
         |  SELECT p.m, p.code, coalesce(pm.mean, p.w) AS w
         |  FROM pq${g - 1} p LEFT JOIN pm$g pm USING (m, code))""".stripMargin
    }.mkString(",\n")
    s"""WITH emb AS MATERIALIZED ($embBase),
       |$unitCte,
       |dims AS MATERIALIZED (
       |  SELECT max(len(u)) AS d, max(len(u)) // $m AS sub FROM unit),
       |${lloydChain(nCent, iters)},
       |ca AS MATERIALIZED (
       |  SELECT vec_id, u, cid FROM (
       |    SELECT t.vec_id, t.u, c.cid,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM unit t, c$iters c) WHERE rn = 1),
       |resid AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |         list_transform(range(1, 1 + (SELECT d FROM dims)),
       |                        i -> a.u[i] - c.u[i]) AS r
       |  FROM ca a JOIN c$iters c USING (cid)),
       |rsub AS MATERIALIZED (
       |  SELECT vec_id, m, list_slice(r, m * sub + 1, (m + 1) * sub) AS sv
       |  FROM resid, dims, (SELECT unnest(range(0, $m)) AS m)),
       |pq0 AS MATERIALIZED (
       |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS code,
       |         sv AS w
       |  FROM rsub
       |  WHERE vec_id IN (SELECT vec_id FROM resid ORDER BY vec_id LIMIT $nCodes)),
       |$pqGens,
       |pe AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT t.vec_id, t.m, w.code,
       |           row_number() OVER (PARTITION BY t.vec_id, t.m
       |             ORDER BY list_dot_product(t.sv, w.w)
       |                      - 0.5 * list_dot_product(w.w, w.w) DESC,
       |                      w.code) AS rn
       |    FROM rsub t JOIN pq$pqIters w USING (m)) WHERE rn = 1),
       |qprobe AS MATERIALIZED (
       |  SELECT vec_id, u, cid, qc FROM (
       |    SELECT t.vec_id, t.u, c.cid, list_dot_product(t.u, c.u) AS qc,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM unit t, c$iters c WHERE t.vec_id < 16) WHERE rn <= $nProbes),
       |approx AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, a.vec_id AS corpus_id,
       |         round(q.qc + sum(list_dot_product(
       |           list_slice(q.u, pe.m * dims.sub + 1, (pe.m + 1) * dims.sub),
       |           w.w)), 6) AS approx
       |  FROM qprobe q
       |  JOIN ca a USING (cid)
       |  JOIN pe ON pe.vec_id = a.vec_id
       |  JOIN pq$pqIters w ON w.m = pe.m AND w.code = pe.code
       |  CROSS JOIN dims
       |  WHERE q.vec_id <> a.vec_id
       |  GROUP BY q.vec_id, a.vec_id, q.qc),
       |short AS MATERIALIZED (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY approx DESC, corpus_id) AS rn FROM approx)
       |  WHERE rn <= $rerank),
       |ex AS (
       |  SELECT s.query_id, s.corpus_id,
       |         round(list_dot_product(qu.u, cu.u), 6) AS cosine
       |  FROM short s
       |  JOIN unit qu ON qu.vec_id = s.query_id
       |  JOIN unit cu ON cu.vec_id = s.corpus_id),
       |top5 AS MATERIALIZED (
       |  SELECT CAST(query_id AS BIGINT) AS query_id,
       |         CAST(corpus_id AS BIGINT) AS corpus_id, cosine,
       |         CAST(rn AS BIGINT) AS rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, corpus_id) AS rn FROM ex)
       |  WHERE rn <= 5),
       |truth AS MATERIALIZED (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT qe.vec_id AS query_id, ce.vec_id AS corpus_id,
       |           row_number() OVER (PARTITION BY qe.vec_id
       |             ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC,
       |                      ce.vec_id) AS rn
       |    FROM emb qe, emb ce
       |    WHERE qe.vec_id < 16 AND qe.vec_id <> ce.vec_id)
       |  WHERE rn <= 5),
       |${recallTail("top5", "truth", "query_id", "corpus_id", floor,
          "top5.query_id, top5.corpus_id, top5.cosine, top5.rank")}""".stripMargin
  }

  /** Oracle for q_incremental_embedding_pq (round 13): the incremental
    * ingest screen against a PERSISTED PQ index, replayed end to end —
    * coarse 8-centroid Lloyd chain trained on the HISTORY split only
    * (vec_id % 4 <> 0, exactly `buildIvfPqIndex(hist, …)`), residuals,
    * 4×8 PQ training (2 iterations), history encode, batch queries
    * (vec_id % 4 = 0) probing ALL 8 lists with ADC scoring rounded to
    * 6 before the top-`rerank` shortlist cut, exact unit-dot refine,
    * threshold ≥ `thr` on the EXACT score, recall-gated against the
    * exact cross-split threshold join. The same float-margin audit
    * that makes [[annIvfPq]] sound covers this chain (identical
    * kernels, same corpus). */
  lazy val incrementalEmbeddingPq: String = {
    val (nCent, iters, nProbes) = (8, 3, 8)
    val (m, nCodes, pqIters, rerank, thr, floor) = (4, 8, 2, 80, 0.4, 0.7)
    val pqGens = (1 to pqIters).map { g =>
      s"""pa$g AS (
         |  SELECT vec_id, m, sv, code FROM (
         |    SELECT t.vec_id, t.m, t.sv, w.code,
         |           row_number() OVER (PARTITION BY t.vec_id, t.m
         |             ORDER BY list_dot_product(t.sv, w.w)
         |                      - 0.5 * list_dot_product(w.w, w.w) DESC,
         |                      w.code) AS rn
         |    FROM rsub t JOIN pq${g - 1} w USING (m)) WHERE rn = 1),
         |pm$g AS (
         |  SELECT m, code, list(s / n ORDER BY i) AS mean
         |  FROM (SELECT m, code, i, sum(sv[i]) AS s, count(*) AS n
         |        FROM pa$g, (SELECT unnest(range(1, 1 + (SELECT sub FROM dims))) AS i)
         |        GROUP BY m, code, i)
         |  GROUP BY m, code),
         |pq$g AS MATERIALIZED (
         |  SELECT p.m, p.code, coalesce(pm.mean, p.w) AS w
         |  FROM pq${g - 1} p LEFT JOIN pm$g pm USING (m, code))""".stripMargin
    }.mkString(",\n")
    s"""WITH emb AS MATERIALIZED ($embBase),
       |$unitCte,
       |hunit AS MATERIALIZED (SELECT * FROM unit WHERE vec_id % 4 <> 0),
       |qunit AS MATERIALIZED (SELECT * FROM unit WHERE vec_id % 4 = 0),
       |dims AS MATERIALIZED (
       |  SELECT max(len(u)) AS d, max(len(u)) // $m AS sub FROM hunit),
       |${lloydChain(nCent, iters, src = "hunit")},
       |ca AS MATERIALIZED (
       |  SELECT vec_id, u, cid FROM (
       |    SELECT t.vec_id, t.u, c.cid,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM hunit t, c$iters c) WHERE rn = 1),
       |resid AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |         list_transform(range(1, 1 + (SELECT d FROM dims)),
       |                        i -> a.u[i] - c.u[i]) AS r
       |  FROM ca a JOIN c$iters c USING (cid)),
       |rsub AS MATERIALIZED (
       |  SELECT vec_id, m, list_slice(r, m * sub + 1, (m + 1) * sub) AS sv
       |  FROM resid, dims, (SELECT unnest(range(0, $m)) AS m)),
       |pq0 AS MATERIALIZED (
       |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS code,
       |         sv AS w
       |  FROM rsub
       |  WHERE vec_id IN (SELECT vec_id FROM resid ORDER BY vec_id LIMIT $nCodes)),
       |$pqGens,
       |pe AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT t.vec_id, t.m, w.code,
       |           row_number() OVER (PARTITION BY t.vec_id, t.m
       |             ORDER BY list_dot_product(t.sv, w.w)
       |                      - 0.5 * list_dot_product(w.w, w.w) DESC,
       |                      w.code) AS rn
       |    FROM rsub t JOIN pq$pqIters w USING (m)) WHERE rn = 1),
       |qprobe AS MATERIALIZED (
       |  SELECT vec_id, u, cid, qc FROM (
       |    SELECT t.vec_id, t.u, c.cid, list_dot_product(t.u, c.u) AS qc,
       |           row_number() OVER (PARTITION BY t.vec_id
       |             ORDER BY list_dot_product(t.u, c.u) DESC, c.cid) AS rn
       |    FROM qunit t, c$iters c) WHERE rn <= $nProbes),
       |approx AS MATERIALIZED (
       |  SELECT q.vec_id AS new_id, a.vec_id AS hist_id,
       |         round(q.qc + sum(list_dot_product(
       |           list_slice(q.u, pe.m * dims.sub + 1, (pe.m + 1) * dims.sub),
       |           w.w)), 6) AS approx
       |  FROM qprobe q
       |  JOIN ca a USING (cid)
       |  JOIN pe ON pe.vec_id = a.vec_id
       |  JOIN pq$pqIters w ON w.m = pe.m AND w.code = pe.code
       |  CROSS JOIN dims
       |  WHERE q.vec_id <> a.vec_id
       |  GROUP BY q.vec_id, a.vec_id, q.qc),
       |short AS MATERIALIZED (
       |  SELECT new_id, hist_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY new_id
       |        ORDER BY approx DESC, hist_id) AS rn FROM approx)
       |  WHERE rn <= $rerank),
       |out AS MATERIALIZED (
       |  SELECT CAST(s.new_id AS BIGINT) AS new_id,
       |         CAST(s.hist_id AS BIGINT) AS hist_id, cosine
       |  FROM (SELECT s.new_id, s.hist_id,
       |               round(list_dot_product(qu.u, cu.u), 6) AS cosine
       |        FROM short s
       |        JOIN qunit qu ON qu.vec_id = s.new_id
       |        JOIN hunit cu ON cu.vec_id = s.hist_id) s
       |  WHERE cosine >= $thr),
       |truth AS MATERIALIZED (
       |  SELECT CAST(a.vec_id AS BIGINT) AS new_id,
       |         CAST(b.vec_id AS BIGINT) AS hist_id
       |  FROM emb a JOIN emb b
       |    ON a.vec_id % 4 = 0 AND b.vec_id % 4 <> 0
       |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= $thr),
       |${recallTail("out", "truth", "new_id", "hist_id", floor,
          "out.new_id, out.hist_id, out.cosine")}""".stripMargin
  }

  /** Oracle for q_embedding_neardup: 4 bands of 3-bit hyperplane
    * buckets (seeds 42-45) over UNIT vectors, same-bucket pairs with
    * rounded unit-dot cosine ≥ 0.4, band-deduped, recall-gated at 0.4
    * against the exact pairwise truth over the one-in-2 id sample. */
  lazy val embeddingNearDup: String = {
    val (nBits, bands, thr, floor) = (3, 4, 0.4, 0.4)
    val bandRows = (0 until bands)
      .map(b => hyperplaneRows(nBits, 42L + b, rowPrefix = s"$b, "))
      .mkString(",\n    ")
    s"""WITH $unitCte,
       |hp(band, bit, coefs) AS (VALUES
       |    $bandRows),
       |bkt AS MATERIALIZED (
       |  SELECT vec_id, band,
       |         CAST(sum(CASE WHEN list_dot_product(u, coefs[1:len(u)]) >= 0
       |                       THEN 1 << bit ELSE 0 END) AS BIGINT) AS b
       |  FROM unit, hp GROUP BY vec_id, band),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT CAST(a.vec_id AS BIGINT) AS id_a,
       |         CAST(bb.vec_id AS BIGINT) AS id_b,
       |         round(list_dot_product(ua.u, ub.u), 6) AS cosine
       |  FROM bkt a JOIN bkt bb USING (band, b)
       |  JOIN unit ua ON ua.vec_id = a.vec_id
       |  JOIN unit ub ON ub.vec_id = bb.vec_id
       |  WHERE a.vec_id < bb.vec_id
       |    AND round(list_dot_product(ua.u, ub.u), 6) >= $thr),
       |truth AS MATERIALIZED (
       |  SELECT CAST(a.vec_id AS BIGINT) AS id_a,
       |         CAST(b.vec_id AS BIGINT) AS id_b
       |  FROM unit a, unit b
       |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 0
       |    AND a.vec_id < b.vec_id
       |    AND round(list_dot_product(a.u, b.u), 6) >= $thr),
       |${recallTail("pairs", "truth", "id_a", "id_b", floor,
          "pairs.id_a, pairs.id_b, pairs.cosine")}""".stripMargin
  }

  // -------------------------------------------------------------------
  // Content-defined chunking (CdcKernels / Dedup.cdcChunks)
  // -------------------------------------------------------------------

  /** The 256-entry gear table reduced to its low `maskBits` bits — the
    * only part of the 64-bit gear values the boundary test can see
    * (`CdcKernels` scaladoc derives why). Spliced as a literal list:
    * like `annLsh`'s hyperplane constants, it is an ALGORITHM constant
    * (splitmix64 of the index, content-independent), so embedding it
    * replays the algorithm rather than leaking answers.
    */
  private def gearLowList(maskBits: Int): String = {
    val mask = (1L << maskBits) - 1
    graft.functions.CdcKernels.Gear
      .map(g => (g & mask).toString).mkString("[", ", ", "]")
  }

  /** The candidate-position CTEs shared by [[cdcChunks]] and
    * [[cdcShared]]: per non-empty document, the 1-based code-point
    * offsets whose trailing-`maskBits`-point window hash has zero low
    * bits. The window sum is UNROLLED (maskBits terms, coefficient 2^k
    * at lookback k) so no nested list comprehension is needed, and the
    * whole test runs mod 2^maskBits — exactly the bits the kernel's
    * 64-bit rolling `h = (h << 1) + gear` exposes to `h & mask`.
    */
  private def cdcCandidates(maskBits: Int): String = {
    val window = (0 until maskBits).map { k =>
      val idx = if (k == 0) "i" else s"i - $k"
      s"g.gl[(unicode(substr(text, $idx, 1)) % 256) + 1] * ${1L << k}"
    }.mkString("\n        + ")
    s"""d AS (
       |  SELECT doc_id, text, length(text) AS n
       |  FROM documents WHERE text IS NOT NULL),
       |g AS (SELECT ${gearLowList(maskBits)} AS gl),
       |pos AS (
       |  SELECT doc_id, n,
       |    list_filter(
       |      [CASE WHEN i >= $maskBits AND (
       |          $window
       |        ) % ${1L << maskBits} = 0 THEN i END for i in range(1, n + 1)],
       |      x -> x IS NOT NULL) AS cands
       |  FROM d, g WHERE n > 0)""".stripMargin
  }

  /** Full replay of [[graft.operators.Dedup.cdcChunks]]: candidates as
    * above, then the greedy min/max walk as a recursive CTE (one row
    * per in-flight document per iteration; depth = max chunks per
    * document), then md5 fingerprints over the same code-point slices.
    */
  def cdcChunks(maskBits: Int, minLen: Int, maxLen: Int): String = {
    def nextEnd(start: String) =
      s"""COALESCE(list_min(list_filter(cands,
         |           c -> c >= $start + $minLen AND c <= LEAST($start + $maxLen, n))),
         |         LEAST($start + $maxLen, n))""".stripMargin
    s"""WITH RECURSIVE
       |${cdcCandidates(maskBits)},
       |walk AS (
       |  SELECT doc_id, n, cands, 0 AS chunk_idx, 0 AS cstart,
       |         ${nextEnd("0")} AS cend
       |  FROM pos
       |  UNION ALL
       |  SELECT doc_id, n, cands, chunk_idx + 1, cend,
       |         ${nextEnd("cend")}
       |  FROM walk WHERE cend < n)
       |SELECT w.doc_id,
       |       CAST(w.chunk_idx AS INTEGER) AS chunk_idx,
       |       CAST(w.cstart AS INTEGER) AS chunk_start,
       |       CAST(w.cend - w.cstart AS INTEGER) AS chunk_len,
       |       md5(substr(d.text, w.cstart + 1, w.cend - w.cstart)) AS chunk_fp
       |FROM walk w JOIN d USING (doc_id)""".stripMargin
  }

  /** Replay of [[graft.operators.Dedup.cdcSharedStats]] over
    * [[cdcChunks]]: fingerprint census, then the per-document shared
    * profile. `SUM` over DuckDB integers widens to HUGEINT, so both
    * sums are cast back to BIGINT to match Spark's long.
    */
  /** Replay of [[graft.operators.Dedup.incrementalCdc]] with the
    * q_incremental_dedup corpus split (doc_id % 4 == 0 is history):
    * chunking is per-document, so chunking everything once and
    * filtering equals the engine's chunk-the-subsets — and the probe
    * join + rollup are plain SQL over the same fingerprints.
    */
  def cdcIncremental(maskBits: Int, minLen: Int, maxLen: Int): String =
    s"""WITH chunks AS (
       |${cdcChunks(maskBits, minLen, maxLen)}),
       |hist AS (
       |  SELECT DISTINCT chunk_fp FROM chunks WHERE doc_id % 4 = 0),
       |batch AS (
       |  SELECT * FROM chunks WHERE doc_id % 4 <> 0)
       |SELECT b.doc_id,
       |       COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN h.chunk_fp IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_known,
       |       CAST(SUM(CASE WHEN h.chunk_fp IS NOT NULL THEN b.chunk_len ELSE 0 END)
       |            AS BIGINT) AS known_len
       |FROM batch b LEFT JOIN hist h USING (chunk_fp)
       |GROUP BY 1""".stripMargin

  def cdcShared(maskBits: Int, minLen: Int, maxLen: Int): String =
    s"""WITH chunks AS (
       |${cdcChunks(maskBits, minLen, maxLen)}),
       |census AS (
       |  SELECT chunk_fp, COUNT(DISTINCT doc_id) AS nd
       |  FROM chunks GROUP BY 1)
       |SELECT c.doc_id,
       |       COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       CAST(SUM(CASE WHEN f.nd > 1 THEN c.chunk_len ELSE 0 END) AS BIGINT)
       |         AS shared_len
       |FROM chunks c JOIN census f USING (chunk_fp)
       |GROUP BY 1""".stripMargin

  // -------------------------------------------------------------------
  // Fixed-point PageRank (graft.operators.Graph.pageRank)
  // -------------------------------------------------------------------

  /** Replay of [[graft.operators.Graph.pageRank]] as a generated
    * per-iteration CTE chain. Exactness holds because the operator is
    * fixed-point by design: every quantity is a BIGINT, every division
    * a floor division on non-negative values (Scala `/` ≡ DuckDB `//`
    * there), and the inbound aggregation a sum of longs — associative,
    * so Spark's partial aggregation and DuckDB's hash aggregate agree
    * bit-for-bit (DuckDB widens SUM to HUGEINT; each use is folded
    * back through BIGINT casts before further integer arithmetic).
    *
    * `edgesSql` supplies the graph as a `SELECT ... src, dst` body —
    * the caller owns the edge derivation, this function owns the
    * recurrence. One CTE per iteration: each references only its
    * predecessor, so the SQL grows linearly in `iters` (~0.5 KB per
    * round) mirroring the engine's per-round checkpoint chain.
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED`: each round
    * reads its predecessor THREE times (state scan, dangling scalar,
    * contribution join), and DuckDB's default is to INLINE the CTE at
    * every reference — 3^iters copies of the whole chain (measured:
    * the 6-iteration sf0.01 query went from >8 min inlined to 1.7 s
    * materialized — the SQL twin of the engine's per-round
    * localCheckpoint, which exists for the same reason).
    */
  def pageRank(edgesSql: String, iters: Int, scale: Long = 1_000_000_000L,
               dampNum: Long = 17L, dampDen: Long = 20L): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    def round(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT s.id, s.outdeg,
         |         CAST($base + ($dampNum * (COALESCE(i.s, 0)
         |                + CAST((SELECT COALESCE(SUM(CASE WHEN outdeg = 0 THEN rank END), 0)
         |                        FROM $prev) AS BIGINT)
         |                  // (SELECT n FROM nn))) // $dampDen AS BIGINT) AS rank
         |  FROM $prev s LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(p.rank // p.outdeg) AS BIGINT) AS s
         |    FROM e JOIN $prev p ON e.src = p.id
         |    GROUP BY e.dst) i ON s.id = i.id)""".stripMargin
    val rounds = (1 to iters).map(k => round(s"r${k - 1}", s"r$k")).mkString(",\n")
    val chain = if (iters == 0) "" else s",\n$rounds"
    s"""WITH raw AS (
       |$edgesSql
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
       |  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
       |), nodes AS MATERIALIZED (
       |  SELECT src AS id FROM e UNION SELECT dst FROM e
       |), nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
       |deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY src),
       |r0 AS MATERIALIZED (
       |  SELECT n.id, COALESCE(d.outdeg, 0) AS outdeg,
       |         CAST($scale AS BIGINT) AS rank
       |  FROM nodes n LEFT JOIN deg d ON n.id = d.id)$chain
       |SELECT CAST(id AS BIGINT) AS id, CAST(rank AS BIGINT) AS rank
       |FROM r$iters""".stripMargin
  }

  // -------------------------------------------------------------------
  // Domain probes (round 10): standalone SQL over a caller-registered
  // `probe_tokens(hx)` view, exercising the byte-hash replay chains at
  // every input length — the evidence behind the r9-flagged domain
  // edges (24–31-byte xxh64 inputs; >32-byte murmur tokens). Consumed
  // by tools/oracle_domain_audit.py, which compares the DuckDB results
  // against the JVM kernels' own values (XXH64 / Murmur3_x86_32) and
  // commits the ledger as oracle_domain_audit.json.
  // -------------------------------------------------------------------

  /** SQL computing the <32-byte XXH64 replay (`hashBytesLevels`) with
    * the MinHash kernel's seed for every hex token in `probe_tokens`.
    * Inputs >= 32 bytes raise the chain's named error — the audited
    * contract for that domain edge. Result: (hx, h) with h the
    * unsigned 64-bit hash. */
  private[graft] def probeXxh64Sql(seed: Long): String = {
    val ch = new Chain("SELECT hx FROM probe_tokens")
    val h = hashBytesLevels(ch, "hx", java.lang.Long.toUnsignedString(seed), "p")
    s"SELECT hx, $h AS h FROM (${ch.sql})"
  }

  /** SQL computing the SimHash per-token murmur3 64-bit hash replay for
    * every hex token in `probe_tokens`, with the row-scoped `odd`
    * out-of-domain flag (length > 4*maxBlocks bytes): flagged rows
    * return NULL h64 instead of killing the query. Result:
    * (hx, odd, h64). */
  private[graft] def probeSimhashTokenSql(maxBlocks: Int): String = {
    // same 4-spare-byte pad as simhashSketchSql: full-width tokens read
    // tail positions past 4*maxBlocks unconditionally
    val ch = new Chain(
      s"SELECT hx, length(hx) > ${8 * maxBlocks} AS odd, " +
        s"rpad(hx, ${8 * maxBlocks + 8}, '0') AS hxp, " +
        s"least(CAST(length(hx) // 2 AS HUGEINT), ${4 * maxBlocks}) AS nn FROM probe_tokens")
    val lo = murmurChain(ch, 0x9747b28cL, maxBlocks, "lo")
    val hi = murmurChain(ch, 0x85ebca6bL, maxBlocks, "hi")
    s"SELECT hx, odd, CASE WHEN odd THEN NULL ELSE ($hi * $M32 + $lo) END AS h64 FROM (${ch.sql})"
  }
}
