package graft

import graft.functions.AvroKernels
import org.apache.spark.sql.functions._

/** [[AvroKernels]] — object-container frame triage. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def build(codec: Option[String], blocks: Seq[(Int, Array[Byte])],
                    negMapBlock: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def vz(n: Long): Unit = {
      var u = (n << 1) ^ (n >> 63)
      var going = true
      while (going) {
        val byte = (u & 0x7f).toInt
        u >>>= 7
        if (u == 0) { bos.write(byte); going = false } else bos.write(byte | 0x80)
      }
    }
    def bs(x: Array[Byte]): Unit = { vz(x.length); bos.write(x) }
    bos.write("Obj".getBytes); bos.write(1)
    val entries = ("avro.schema", "\"bytes\"") +:
      codec.map(c => ("avro.codec", c)).toSeq
    if (negMapBlock) {
      // negative-count map block: (-n, byteSize) prefix form
      val inner = new java.io.ByteArrayOutputStream()
      val save = bos
      // measure the entry bytes by writing them into a scratch buffer
      val scratch = new java.io.ByteArrayOutputStream()
      def vz2(o: java.io.ByteArrayOutputStream, n: Long): Unit = {
        var u = (n << 1) ^ (n >> 63); var going = true
        while (going) {
          val b2 = (u & 0x7f).toInt; u >>>= 7
          if (u == 0) { o.write(b2); going = false } else o.write(b2 | 0x80)
        }
      }
      entries.foreach { case (k, v) =>
        vz2(scratch, k.length); scratch.write(k.getBytes)
        vz2(scratch, v.length); scratch.write(v.getBytes)
      }
      vz(-entries.length)
      vz(scratch.size())
      bos.write(scratch.toByteArray)
      val _ = (inner, save)
    } else {
      vz(entries.length)
      entries.foreach { case (k, v) => bs(k.getBytes); bs(v.getBytes) }
    }
    vz(0)
    val sync = Array.tabulate[Byte](16)(i => (i * 3 + 1).toByte)
    bos.write(sync)
    blocks.foreach { case (count, data) =>
      vz(count); vz(data.length); bos.write(data); bos.write(sync)
    }
    bos.toByteArray
  }

  private def metaOf(b: Array[Byte]): Option[(String, String, Long, Long)] =
    Option(AvroKernels.meta(b)).map(r => (r.getUTF8String(0).toString,
      r.getUTF8String(1).toString, r.getLong(2), r.getLong(3)))

  test("header metadata, codec default, block/record counts from frames") {
    val a = build(Some("deflate"),
      Seq((3, "abc".getBytes), (4, "defgh".getBytes)))
    assert(metaOf(a).contains(("\"bytes\"", "deflate", 2L, 7L)))
    val noCodec = build(None, Seq((1, "x".getBytes)))
    assert(metaOf(noCodec).contains(("\"bytes\"", "null", 1L, 1L)))
    val empty = build(Some("null"), Seq.empty)
    assert(metaOf(empty).contains(("\"bytes\"", "null", 0L, 0L)))
    // negative-count (size-prefixed) metadata map block form
    val neg = build(Some("snappy"), Seq((2, "zz".getBytes)), negMapBlock = true)
    assert(metaOf(neg).contains(("\"bytes\"", "snappy", 1L, 2L)))
  }

  test("fail-closed: magic, truncation, sync mismatch, missing schema, fuzz") {
    val good = build(Some("null"), Seq((3, "abc".getBytes)))
    assert(AvroKernels.meta("Obj2junk".getBytes) == null)
    assert(AvroKernels.meta(good.dropRight(1)) == null)  // truncated sync
    assert(AvroKernels.meta(good.take(30)) == null)
    val badSync = good.clone()
    badSync(badSync.length - 1) = (badSync(badSync.length - 1) ^ 0x7f).toByte
    assert(AvroKernels.meta(badSync) == null)
    // a container whose metadata lacks avro.schema
    val noSchema = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("Obj".getBytes); bos.write(1); bos.write(0) // empty map
      bos.write(new Array[Byte](16))
      bos.toByteArray
    }
    assert(AvroKernels.meta(noSchema) == null)
    val rnd = new scala.util.Random(0xa7a0)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      AvroKernels.meta(junk)
      val fl = good.clone()
      fl(rnd.nextInt(fl.length)) = (fl(rnd.nextInt(fl.length)) ^ rnd.nextInt(256)).toByte
      AvroKernels.meta(fl)
    }
  }

  test("SQL surface") {
    val a = build(Some("null"), Seq((5, "12345".getBytes)))
    val n = spark.sql("SELECT avro_meta(unhex('" +
        a.map("%02x".format(_)).mkString + "')).n_records AS n")
      .as[Long].head()
    assert(n == 5L)
  }
}
