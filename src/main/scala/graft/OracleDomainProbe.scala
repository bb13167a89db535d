package graft

/** Emits the hash-domain audit fixture consumed by
  * tools/oracle_domain_audit.py (round 10).
  *
  * Round 9 flagged two domain edges in the DuckDB hash replays as
  * false-RED fragility: the <32-byte XXH64 chain's upper word rounds
  * (24–31-byte inputs) and the SimHash murmur chain's behavior past its
  * 32-byte token window. This main prints, as one JSON document:
  *   - the two standalone probe SQL strings (over a `probe_tokens(hx)`
  *     view the tool registers), and
  *   - for every byte length 1..40 plus multi-byte/high-bit edge
  *     tokens, the JVM kernels' OWN hash values
  *     (`XXH64.hashUnsafeBytes`, `Murmur3_x86_32.hashUnsafeBytes` —
  *     the exact functions the engine's kernels call).
  * The tool replays the SQL in DuckDB and asserts bit-for-bit equality
  * across the whole in-domain range, NULL (row-scoped, not
  * query-killing) for >32-byte murmur tokens, and a NAMED error for
  * >=32-byte xxh64 inputs. No SparkSession needed — the kernels are
  * static JVM code.
  */
object OracleDomainProbe {
  private val Off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  def main(args: Array[String]): Unit = {
    // deterministic byte patterns per length, deliberately including
    // high-bit bytes (murmur's tail-byte SIGN-EXTENSION is the subtle
    // replay step) and the 24/28/31/32/33/40 domain-edge lengths
    val synthetic = (1 to 40).map { n =>
      (0 until n).map(i => ((i * 37 + n * 101) & 0xff).toByte).toArray
    }
    // real multi-byte UTF-8 tokens of the shape whitespace tokenization
    // produces on non-ASCII corpora
    val utf8 = Seq("héllo", "日本語テスト", "emoji😀tok", "ßharfes")
      .map(_.getBytes("UTF-8"))
    val tokens = synthetic ++ utf8

    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    def u64(x: Long): String = java.lang.Long.toUnsignedString(x)

    val rows = tokens.map { b =>
      val n = b.length
      val xx =
        if (n < 32) "\"" + u64(
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(b, Off.toLong, n, 42L)) + "\""
        else "null"
      val mm =
        if (n <= 32) {
          val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(b, Off.toLong, n, 0x9747b28c)
          val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(b, Off.toLong, n, 0x85ebca6b)
          "\"" + u64((hi.toLong << 32) | (lo.toLong & 0xffffffffL)) + "\""
        } else "null"
      s"""{"hx":"${hex(b)}","len":$n,"xxh64":$xx,"h64":$mm}"""
    }

    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    val doc =
      s"""{"xxh64_seed":42,
         |"sql_xxh64":${jstr(OracleSqlGen.probeXxh64Sql(42L))},
         |"sql_murmur":${jstr(OracleSqlGen.probeSimhashTokenSql(8))},
         |"tokens":[${rows.mkString(",\n")}]}""".stripMargin
    val out = if (args.nonEmpty) args(0) else "target/oracle_domain_probe.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    System.err.println(s"[probe] wrote $out (${tokens.size} tokens)")
  }
}
