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

  /** Chain of nested SELECTs — each level adds ONE named column over the
    * previous level, so every intermediate is shared by reference and
    * the generated text stays linear in the step count. */
  private final class Chain(var sql: String) {
    def lvl(name: String, expr: String): String = {
      sql = s"SELECT *, $expr AS $name FROM ($sql)"
      name
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

  /** XXH64.hashUnsafeBytes(bytes(hxCol), 42) for < 32-byte inputs:
    * 0-2 LE words, optional LE 4-byte chunk, 0-3 tail bytes, fmix. */
  private def hashBytesChain(baseSql: String, hxCol: String): (Chain, String) = {
    val ch = new Chain(baseSql)
    val hxp = ch.lvl("hxp", s"rpad($hxCol, 64, '0')")
    val nn = ch.lvl("nn", s"CAST(length($hxCol) // 2 AS HUGEINT)")
    val wc = ch.lvl("wcnt", s"($nn // 8)")
    val rem = ch.lvl("rem", s"($nn - 8 * $wc)")
    val tl = ch.lvl("tl", s"CASE WHEN $rem >= 4 THEN $rem - 4 ELSE $rem END")
    def leSum(idx: Int => String, n: Int): String =
      (0 until n).map { i =>
        s"${byteAt(hxp, idx(i))} * ${java.math.BigInteger.ONE.shiftLeft(8 * i)}"
      }.mkString(" + ")
    val wA = ch.lvl("wA", leSum(i => s"${i + 1}", 8))
    val wB = ch.lvl("wB", leSum(i => s"${i + 9}", 8))
    val k4 = ch.lvl("k4", leSum(j => s"8 * $wc + ${j + 1}", 4))
    val tb = (1 to 3).map(j => ch.lvl(s"tb$j", byteAt(hxp, s"$nn - $tl + $j")))
    var h = ch.lvl("c0", add64(nn, Seed42P5))
    h = wordRound(ch, h, wA, s"$nn >= 8", "wa")
    h = wordRound(ch, h, wB, s"$nn >= 16", "wb")
    val c1 = ch.lvl("c1", xor64(h, m64(k4, P1)))
    val c2 = ch.lvl("c2", rot(c1, 23))
    val c3 = ch.lvl("c3", add64(m64(c2, P2), P3))
    h = ch.lvl("chk", s"CASE WHEN $rem >= 4 THEN $c3 ELSE $h END")
    for (j <- 1 to 3) {
      val b1 = ch.lvl(s"b${j}1", xor64(h, m64(tb(j - 1), P5)))
      val b2 = ch.lvl(s"b${j}2", rot(b1, 11))
      val b3 = ch.lvl(s"b${j}3", m64(b2, P1))
      h = ch.lvl(s"bh$j", s"CASE WHEN $tl >= $j THEN $b3 ELSE $h END")
    }
    (ch, fmix(ch, h, "sb"))
  }

  /** (doc_id, h) — the distinct 5-char-shingle XXH64 set per document,
    * mirroring TextFunctions.shingleHashes (lower+trim, whole-string
    * fallback for <= n chars, hash-level dedup). */
  private def shingleHashSql(n: Int): String = {
    val base =
      s"""SELECT doc_id, hex(encode(g)) AS hx FROM (
         |  SELECT doc_id, unnest(CASE WHEN length(s) <= $n THEN [s]
         |      ELSE list_distinct([substr(s, i, $n) for i in range(1, length(s) - ${n - 2})])
         |    END) AS g
         |  FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents
         |        WHERE text IS NOT NULL))""".stripMargin
    val (ch, hcol) = hashBytesChain(base, "hx")
    s"SELECT doc_id, $hcol AS h FROM (${ch.sql}) GROUP BY doc_id, $hcol"
  }

  /** (doc_id, kk, v) — MinHash member kk = signed-min over
    * hashLong(h, kk), unsigned representation restored after the MIN. */
  private def sigSql(hsSql: String, k: Int): String = {
    val ch = new Chain(
      s"SELECT doc_id, h, unnest(range($k)) AS kk FROM ($hsSql)")
    val v = hashLong(ch, "h", "kk", "mh")
    ch.lvl("skey", signedKey(v))
    s"SELECT doc_id, kk, ${signedKey("min(skey)")} AS v FROM (${ch.sql}) GROUP BY doc_id, kk"
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
}
