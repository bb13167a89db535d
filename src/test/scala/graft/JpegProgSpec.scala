package graft

import graft.functions.JpegKernels
import org.scalatest.funsuite.AnyFunSuite

/** Test-only PROGRESSIVE encoder (G.1.2/G.1.3 inverted): a fixed scan
  * script — interleaved DC first (Al=1) + DC refinement, then per
  * component AC first (Al=1) and AC refinement (Ah=1, Al=0) over given
  * spectral bands — from the same quantized-coefficient suppliers as
  * [[JpegEnc.encode]]. EOB runs are real (with the refinement pass's
  * buffered correction bits); ZRL inside refinement is not emitted
  * (runs must stay < 16 — the decoder's ZRL-refine path gets its own
  * hand-written stream in the spec).
  *
  * [[JpegProgSpec]] pins the decoder in two directions, like JpegSpec:
  * this encoder + the independent reference reconstruction give EXACT
  * expected means; and the JDK's own progressive encoder (ImageIO,
  * progressive mode) provides real multi-scan scripts whose means must
  * track the JDK reader within IDCT-implementation tolerance. A
  * progressive stream encodes the SAME coefficients as a baseline one,
  * so the two modes must also agree with each other EXACTLY on
  * identical coefficient input. */
object JpegProgEnc {
  import JpegEnc._

  private def cat(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** The Annex K AC table has no EOBn symbols (0x10..0xE0 — they exist
    * only in progressive mode), so the AC scans carry their own table:
    * all 64 (run, size<=3) symbols at a flat 8-bit code length — a
    * legal (incomplete) canonical table that keeps the encoder trivially
    * correct. */
  val AcProgBits: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 0, 0)
  val AcProgVals: Array[Int] =
    (for (r <- 0 until 16; s <- 0 until 4) yield (r << 4) | s).toArray

  def encodeProgressive(width: Int, height: Int, sampling: Seq[(Int, Int)],
                        qt: Array[Int], blocks: Int => (Int, Int) => Array[Int],
                        acBands: Seq[(Int, Int)] = Seq((1, 63))): Array[Byte] = {
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val nf = sampling.length
    val dcC = codes(DcBits, DcVals)
    val acC = codes(AcProgBits, AcProgVals)
    // non-interleaved AC scans walk the component's REAL block grid
    val compBx = sampling.map { case (h, _) =>
      ((width * h + hMax - 1) / hMax + 7) / 8 }
    val compBy = sampling.map { case (_, v) =>
      ((height * v + vMax - 1) / vMax + 7) / 8 }

    def sosSeg(cis: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
      seg(0xda, Array(cis.length.toByte) ++
        cis.flatMap(ci => Array((ci + 1).toByte,
          (if (ss == 0) 0x00 else 0x01).toByte)) ++
        Array(ss.toByte, se.toByte, ((ah << 4) | al).toByte))

    // ---- DC first (interleaved, Al = 1): arithmetic-shift point
    // transform, category + magnitude bits like sequential DC ----
    def dcFirst(): Array[Byte] = {
      val w = new BitWriter
      val preds = new Array[Int](nf)
      for (mcu <- 0 until mcusX * mcusY) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        for (ci <- 0 until nf; by <- 0 until sampling(ci)._2;
             bx <- 0 until sampling(ci)._1) {
          val c0 = blocks(ci)(mx * sampling(ci)._1 + bx,
            my * sampling(ci)._2 + by)(0) >> 1
          val diff = c0 - preds(ci)
          preds(ci) = c0
          val t = cat(diff)
          val (c, l) = dcC(t)
          w.put(c, l)
          if (t > 0) w.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        }
      }
      w.flushWithOnes()
      sosSeg(0 until nf, 0, 0, 0, 1) ++ w.buf
    }

    // ---- DC refinement (Al = 0): one raw bit per block ----
    def dcRefine(): Array[Byte] = {
      val w = new BitWriter
      for (mcu <- 0 until mcusX * mcusY) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        for (ci <- 0 until nf; by <- 0 until sampling(ci)._2;
             bx <- 0 until sampling(ci)._1)
          w.put(blocks(ci)(mx * sampling(ci)._1 + bx,
            my * sampling(ci)._2 + by)(0) & 1, 1)
      }
      w.flushWithOnes()
      sosSeg(0 until nf, 0, 0, 1, 0) ++ w.buf
    }

    // ---- AC first (one component, band [ss, se], Al = 1):
    // toward-zero point transform, runs/ZRL/EOBn ----
    def acFirst(ci: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
      val w = new BitWriter
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((1 << (r + 1)) <= eobrun && r < 14) r += 1
        val (c, l) = acC(r << 4)
        w.put(c, l)
        if (r > 0) w.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      for (by <- 0 until compBy(ci); bx <- 0 until compBx(ci)) {
        val coef = blocks(ci)(bx, by)
        val t = (ss to se).map { k =>
          val v = coef(Zigzag(k))
          val a = math.abs(v) >> al
          if (v < 0) -a else a
        }.toArray
        val lastNz = t.lastIndexWhere(_ != 0)
        if (lastNz < 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
        else {
          flushEob()
          var run = 0
          for (i <- 0 to lastNz) {
            val v = t(i)
            if (v == 0) run += 1
            else {
              while (run >= 16) { val (zc, zl) = acC(0xf0); w.put(zc, zl); run -= 16 }
              val s = cat(v)
              val (rc, rl) = acC((run << 4) | s)
              w.put(rc, rl)
              w.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
          }
          if (lastNz < t.length - 1) eobrun += 1
        }
      }
      flushEob()
      w.flushWithOnes()
      sosSeg(Seq(ci), ss, se, 0, al) ++ w.buf
    }

    // ---- AC refinement (one component, band [ss, se], Ah=1, Al=0):
    // newly-nonzero insertions with inline crossed correction bits,
    // EOB runs with buffered correction bits ----
    def acRefine(ci: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
      val w = new BitWriter
      var eobrun = 0
      val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = {
        if (eobrun > 0) {
          var r = 0
          while ((1 << (r + 1)) <= eobrun && r < 14) r += 1
          val (c, l) = acC(r << 4)
          w.put(c, l)
          if (r > 0) w.put(eobrun - (1 << r), r)
          eobrun = 0
        }
        pending.foreach(w.put(_, 1))
        pending.clear()
      }
      for (by <- 0 until compBy(ci); bx <- 0 until compBx(ci)) {
        val coef = blocks(ci)(bx, by)
        // per position: 0 = zero at this precision, 1 = newly nonzero,
        // >1 = nonzero history (emit its next bit as a correction)
        val t = (ss to se).map { k =>
          math.abs(coef(Zigzag(k))) >> al }.toArray
        val signs = (ss to se).map(k => coef(Zigzag(k)) >= 0).toArray
        val newIdx = t.indices.filter(t(_) == 1)
        if (newIdx.isEmpty) {
          eobrun += 1
          t.indices.foreach(i => if (t(i) > 1) pending += (t(i) & 1))
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var from = 0
          for (kn <- newIdx) {
            val r = (from until kn).count(t(_) == 0)
            require(r < 16, "test encoder: ZRL in refinement not supported")
            val (rc, rl) = acC((r << 4) | 1)
            w.put(rc, rl)
            w.put(if (signs(kn)) 1 else 0, 1)
            (from until kn).foreach(i => if (t(i) > 1) w.put(t(i) & 1, 1))
            from = kn + 1
          }
          if (from < t.length) {
            eobrun += 1
            (from until t.length).foreach(i =>
              if (t(i) > 1) pending += (t(i) & 1))
          }
        }
      }
      flushEob()
      w.flushWithOnes()
      sosSeg(Seq(ci), ss, se, 1, al) ++ w.buf
    }

    val sof = Array(8.toByte, (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte, nf.toByte) ++
      sampling.zipWithIndex.flatMap { case ((h, v), i) =>
        Array((i + 1).toByte, ((h << 4) | v).toByte, 0.toByte) }
    val scans = scala.collection.mutable.ArrayBuffer.empty[Byte]
    scans ++= dcFirst()
    scans ++= dcRefine()
    for (ci <- 0 until nf; (bs, be) <- acBands) scans ++= acFirst(ci, bs, be, 1)
    for (ci <- 0 until nf; (bs, be) <- acBands) scans ++= acRefine(ci, bs, be, 0)
    Array(0xff.toByte, 0xd8.toByte) ++
      dqt(0, qt) ++
      dht(0, 0, DcBits, DcVals) ++ dht(1, 1, AcProgBits, AcProgVals) ++
      seg(0xc2, sof) ++
      scans.toArray ++
      Array(0xff.toByte, 0xd9.toByte)
  }
}

class JpegProgSpec extends AnyFunSuite {
  import JpegEnc._
  import JpegProgEnc._

  private def imageIoProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    val out = bos.toByteArray
    // prove the stream is really SOF2
    assert(out.indices.exists(i => i + 1 < out.length &&
      (out(i) & 0xff) == 0xff && (out(i + 1) & 0xff) == 0xc2),
      "encoder did not produce a progressive stream")
    out
  }

  private val flatQt = Array.fill(64)(8)

  /** Deterministic block supplier: mixed signs, odd and even values
    * (odd values force real refinement bits), block-dependent. */
  private def mixedBlocks(ci: Int)(bx: Int, by: Int): Array[Int] = {
    val a = new Array[Int](64)
    a(0) = 11 + 7 * bx - 5 * by + ci         // odd/even DC mix
    a(1) = 3 - bx + ci                        // low AC
    a(8) = -5 + by
    a(17) = if ((bx + by + ci) % 2 == 0) 7 else 0
    a(40) = if ((bx + by) % 3 == 0) -9 else 0 // high band, often zero -> EOB runs
    a
  }

  test("progressive gray == reference, exactly (DC+AC first and refinement)") {
    val (w, h) = (21, 13) // 3x2 MCUs with ragged edges
    val bytes = JpegProgEnc.encodeProgressive(w, h, Seq((1, 1)), flatQt,
      mixedBlocks)
    val (er, _, _) = refMeans(w, h, Seq((1, 1)), flatQt, mixedBlocks)
    val r = JpegKernels.decode(bytes).get
    assert((r.width, r.height) == ((w, h)))
    assert(r.meanR == er && r.meanG == er && r.meanB == er)
  }

  test("progressive == baseline on identical coefficients, exactly") {
    val (w, h) = (16, 16)
    val prog = JpegKernels.decode(
      JpegProgEnc.encodeProgressive(w, h, Seq((1, 1)), flatQt, mixedBlocks)).get
    val base = JpegKernels.decode(
      encode(w, h, Seq((1, 1)), flatQt, mixedBlocks)).get
    assert(prog == base)
  }

  test("progressive 4:2:0 color with split spectral bands == reference") {
    val (w, h) = (19, 11)
    val sampling = Seq((2, 2), (1, 1), (1, 1))
    val bytes = JpegProgEnc.encodeProgressive(w, h, sampling, flatQt,
      mixedBlocks, acBands = Seq((1, 5), (6, 63)))
    val (er, eg, eb) = refMeans(w, h, sampling, flatQt, mixedBlocks)
    val r = JpegKernels.decode(bytes).get
    assert((r.width, r.height) == ((w, h)))
    assert(r.meanR == er && r.meanG == eg && r.meanB == eb)
    assert(r.meanR != r.meanG) // chroma actually moved the channels
  }

  test("EOB runs spanning many blocks (sparse high band) == reference") {
    // high band nonzero only in one block out of 12 -> a long EOBn with
    // extension bits, plus refinement correction bits buffered across
    // the run (blocks with odd low-AC history inside the EOB run)
    def sparse(ci: Int)(bx: Int, by: Int): Array[Int] = {
      val a = new Array[Int](64)
      a(0) = 4 * bx + 2 * by
      a(1) = if ((bx + by) % 2 == 0) 3 else 0 // odd history -> correction bits
      a(40) = if (bx == 2 && by == 1) 6 else 0
      a
    }
    val (w, h) = (32, 24) // 4x3 blocks
    val bytes = JpegProgEnc.encodeProgressive(w, h, Seq((1, 1)), flatQt,
      sparse, acBands = Seq((1, 9), (10, 63)))
    val (er, _, _) = refMeans(w, h, Seq((1, 1)), flatQt, sparse)
    val r = JpegKernels.decode(bytes).get
    assert(r.meanR == er)
  }

  test("hand-written ZRL inside an AC refinement scan") {
    // One 8x8 block, flat qt. History after the first pass (Al=1):
    // zigzag 1 = 2 (even -> correction bit 0 at Al=0), zigzag 20 = 6.
    // The refinement scan inserts +1 at zigzag 18 after a ZRL: 16
    // zero-history positions (2..17, which includes nothing nonzero)
    // then r=0 more, crossing the history coefficient at zigzag 1 on
    // the way? — layout chosen so the crossings are unambiguous:
    //   band [1,63]; positions: zz1 history(2), zz2..zz17 zeros (16 of
    //   them -> one ZRL whose advance consumes zz1's correction bit
    //   first), insertion at zz18, tail all zero -> EOB0 with zz20's
    //   correction bit?  zz20 = 6 sits AFTER the insertion, so its bit
    //   rides the EOB.
    val dcC = codes(DcBits, DcVals)
    val acC = codes(AcBits, AcVals)
    def sos1(ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
      seg(0xda, Array(1.toByte, 1.toByte, 0x00.toByte,
        ss.toByte, se.toByte, ((ah << 4) | al).toByte))
    // scan 1: DC first Al=1 (dc = 10 -> emits 5)
    val w1 = new BitWriter
    locally {
      val t = { var c = 0; var a = 5; while (a != 0) { c += 1; a >>= 1 }; c }
      val (c, l) = dcC(t); w1.put(c, l); w1.put(5, t)
    }
    w1.flushWithOnes()
    // scan 2: AC first [1,63] Al=1: zz1 = 1 (from 2>>1), zz20 = 3 (6>>1)
    val w2 = new BitWriter
    locally {
      def putAc(run: Int, v: Int): Unit = {
        val s = { var c = 0; var a = math.abs(v); while (a != 0) { c += 1; a >>= 1 }; c }
        val (rc, rl) = acC((run << 4) | s)
        w2.put(rc, rl)
        w2.put(if (v < 0) v + (1 << s) - 1 else v, s)
      }
      putAc(0, 1) // zz1
      val (zc, zl) = acC(0xf0); w2.put(zc, zl) // ZRL: 16 zeros (zz2..zz17)
      putAc(2, 3) // 2 more zeros (zz18, zz19), then zz20
      val (ec, el) = acC(0x00); w2.put(ec, el) // EOB
    }
    w2.flushWithOnes()
    // scan 3: AC refine [1,63] Ah=1 Al=0. Wire, in decoder order:
    //   symbol ZRL; advance consumes zz1's correction bit (0: 2 is
    //     even) then 16 zero-history positions zz2..zz17;
    //   symbol (0<<4)|1 + sign 1; advance stops at zz18 (zero-history,
    //     r=0); insert +1;
    //   EOB0; tail zz19..zz63 carries zz20's correction bit (0: 6
    //     is even).
    val w3 = new BitWriter
    locally {
      val (zc, zl) = acC(0xf0); w3.put(zc, zl) // ZRL
      w3.put(0, 1) // zz1 correction bit (crossed during the ZRL advance)
      val (rc, rl) = acC(0x01); w3.put(rc, rl) // r=0, s=1
      w3.put(1, 1) // sign: +1
      val (ec, el) = acC(0x00); w3.put(ec, el) // EOB0
      w3.put(0, 1) // zz20 correction bit (tail, inside the EOB run)
    }
    w3.flushWithOnes()
    val sof = Array(8.toByte, 0.toByte, 8.toByte, 0.toByte, 8.toByte,
      1.toByte, 1.toByte, 0x11.toByte, 0.toByte)
    val stream = Array(0xff.toByte, 0xd8.toByte) ++
      dqt(0, flatQt) ++
      dht(0, 0, DcBits, DcVals) ++ dht(1, 0, AcBits, AcVals) ++
      seg(0xc2, sof) ++
      sos1(0, 0, 0, 1) ++ w1.buf ++
      sos1(0, 0, 1, 0) ++ Array(0.toByte) ++ // DC refine: one 0 bit (pad 1s follow)
      sos1(1, 63, 0, 1) ++ w2.buf ++
      sos1(1, 63, 1, 0) ++ w3.buf ++
      Array(0xff.toByte, 0xd9.toByte)
    // expected final coefficients (natural order via zigzag mapping)
    val coef = new Array[Int](64)
    coef(Zigzag(0)) = 10
    coef(Zigzag(1)) = 2
    coef(Zigzag(18)) = 1
    coef(Zigzag(20)) = 6
    val want = refBlockPixels(coef, flatQt).sum / 64.0
    val r = JpegKernels.decode(stream).get
    assert(r.meanR == want, s"got ${r.meanR}, want $want")
  }

  test("forged SOF2 dies before the coefficient grids are allocated") {
    // 8000x8000 gray = 1M blocks: the Int grid would be 64M entries
    // (256 MB) — under the absolute 1<<26 cap, so only the
    // bytes-remaining plausibility gate stands between a ~90-byte
    // forged blob and that allocation. Measure thread allocation to
    // pin that the gate fires BEFORE the grids are built (the forged
    // blob also decodes to None either way, which alone can't tell
    // gate-then-None from alloc-then-None).
    val sof = Array(8.toByte,
      (8000 >> 8).toByte, (8000 & 0xff).toByte,
      (8000 >> 8).toByte, (8000 & 0xff).toByte,
      1.toByte, 1.toByte, 0x11.toByte, 0.toByte)
    val sos = seg(0xda, Array(1.toByte, 1.toByte, 0x00.toByte,
      0.toByte, 0.toByte, 0x10.toByte))
    val stream = Array(0xff.toByte, 0xd8.toByte) ++
      dqt(0, flatQt) ++ dht(0, 0, DcBits, DcVals) ++
      seg(0xc2, sof) ++ sos ++ Array(0.toByte) ++
      Array(0xff.toByte, 0xd9.toByte)
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val before = bean.getThreadAllocatedBytes(tid)
    assert(JpegKernels.decode(stream).isEmpty)
    val allocated = bean.getThreadAllocatedBytes(tid) - before
    assert(allocated < 8L * 1024 * 1024,
      s"decode allocated $allocated bytes on a forged SOF2 — " +
        "the coefficient grids were built before the gate")
  }

  test("progressive scan count is bounded: a scan-spam stream returns None") {
    // One 8x8 gray block, one legal DC-first scan, then 300 DC
    // refinement scans (each shape-legal: ah=1, al=0, ~10 bytes). Every
    // scan forces a full grid walk, so an unbounded count is a CPU
    // amplifier; no legal encoder emits anything close to the 256 cap.
    val dcC = codes(DcBits, DcVals)
    def sos1(ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
      seg(0xda, Array(1.toByte, 1.toByte, 0x00.toByte,
        ss.toByte, se.toByte, ((ah << 4) | al).toByte))
    val w1 = new BitWriter
    locally { val (c, l) = dcC(0); w1.put(c, l) } // DC diff 0
    w1.flushWithOnes()
    val sof = Array(8.toByte, 0.toByte, 8.toByte, 0.toByte, 8.toByte,
      1.toByte, 1.toByte, 0x11.toByte, 0.toByte)
    val head = Array(0xff.toByte, 0xd8.toByte) ++
      dqt(0, flatQt) ++ dht(0, 0, DcBits, DcVals) ++
      seg(0xc2, sof) ++ sos1(0, 0, 0, 1) ++ w1.buf
    val refine = sos1(0, 0, 1, 0) ++ Array(0.toByte) // one raw bit + 1-pad
    val eoi = Array(0xff.toByte, 0xd9.toByte)
    // 10 refinement scans: legal-ish, decodes
    assert(JpegKernels.decode(
      head ++ Array.fill(10)(refine).flatten ++ eoi).isDefined)
    // 300: past the cap, refused
    assert(JpegKernels.decode(
      head ++ Array.fill(300)(refine).flatten ++ eoi).isEmpty)
  }

  test("ImageIO progressive gray: multi-scan script tracks the JDK reader") {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 37 + y * 11) % 256)
    val bytes = imageIoProgressive(img)
    val ours = JpegKernels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var s = 0.0
    for (y <- 0 until h; x <- 0 until w) s += ref.getRaster.getSample(x, y, 0)
    assert((ours.width, ours.height) == ((w, h)))
    assert(math.abs(ours.meanR - s / (w * h)) < 2.0,
      s"ours ${ours.meanR} vs jdk ${s / (w * h)}")
  }

  test("ImageIO progressive color (subsampled): tracks the JDK reader per channel") {
    val (w, h) = (37, 23)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 57) % 256
      val g = (x * 7 + y * 3) % 256
      val b = (x * x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoProgressive(img)
    val ours = JpegKernels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val px = ref.getRGB(x, y)
      sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
    }
    val n = (w * h).toDouble
    assert((ours.width, ours.height) == ((w, h)))
    assert(math.abs(ours.meanR - sr / n) < 2.0, s"R ${ours.meanR} vs ${sr / n}")
    assert(math.abs(ours.meanG - sg / n) < 2.0, s"G ${ours.meanG} vs ${sg / n}")
    assert(math.abs(ours.meanB - sb / n) < 2.0, s"B ${ours.meanB} vs ${sb / n}")
  }
}
