package graft

import org.scalatest.funsuite.AnyFunSuite

/** Domain-edge pins for the DuckDB hash replays (round 10).
  *
  * The full bit-for-bit evidence lives in the committed
  * `oracle_domain_audit.json` (produced by graft.OracleDomainProbe +
  * tools/oracle_domain_audit.py, which replays the probe SQL in DuckDB
  * against the JVM kernels at every byte length 1..40). This spec pins
  * the JVM-side halves of that loop — the kernel hashes at the
  * round-9-flagged lengths — and the structural contracts of the
  * generated SQL, so a regression in either side of the audit breaks
  * `sbt test` without needing DuckDB in the JVM.
  */
class OracleDomainSpec extends AnyFunSuite {
  private val Off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  private def tok(n: Int): Array[Byte] =
    (0 until n).map(i => ((i * 37 + n * 101) & 0xff).toByte).toArray

  test("xxh64 kernel pins at the 24-31-byte domain edge (audit fixture lengths)") {
    def xx(b: Array[Byte]): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, Off.toLong, b.length, 42L)
    // values cross-checked bit-for-bit against the DuckDB chain by
    // tools/oracle_domain_audit.py on 2026-08-14 (all green); a change
    // here means the FIXTURE drifted and the audit must be re-run
    assert(xx(tok(24)) === -330915183351585418L)
    assert(xx(tok(28)) === -4395450386412974222L)
    assert(xx(tok(31)) === 5729708178120300435L)
  }

  test("simhash murmur kernel pins at the 32-byte domain edge") {
    def h64(b: Array[Byte]): Long = {
      val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(b, Off.toLong, b.length, 0x9747b28c)
      val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(b, Off.toLong, b.length, 0x85ebca6b)
      (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
    }
    assert(h64(tok(32)) === 5269423821269504927L)
    assert(h64("日本語テスト".getBytes("UTF-8")) === 927573108972399856L)
  }

  test("murmur token replay is row-scoped past 32 bytes, never query-killing") {
    val sql = OracleSqlGen.probeSimhashTokenSql(8)
    // the out-of-domain path must be a NULL-producing CASE on the odd
    // flag — error() here killed whole oracle queries in round 9
    assert(sql.contains("CASE WHEN odd THEN NULL"))
    assert(!sql.contains("error("))
    // full-width tokens read tail positions past 4*maxBlocks
    // unconditionally: the pad must carry spare zero bytes
    assert(sql.contains(s"rpad(hx, ${8 * 8 + 8}, '0')"))
  }

  test("xxh64 replay keeps its NAMED out-of-domain error at >=32 bytes") {
    val sql = OracleSqlGen.probeXxh64Sql(42L)
    assert(sql.contains("out of domain"))
    assert(sql.contains("nn >= 24")) // the third word round covers 24-31
  }

  test("dedupSimhash oracle carries the row-scoped odd flag end-to-end") {
    val sql = OracleSqlGen.dedupSimhash
    assert(sql.contains("bool_or(odd)"))
    assert(sql.contains("CASE WHEN k.anyodd THEN NULL"))
    assert(!sql.contains("error("))
  }
}
