package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The JPEG DC-decode tier: [[Multimodal.jpegDcStats]] must really
  * entropy-decode — verified two independent ways: (a) closed form
  * against the generator's DC pattern, (b) against the JDK's own FULL
  * IDCT decode of the same bytes (a DC-only block's spatial pixels are
  * all exactly `128 + dcq/8`, since every AC basis function is
  * zero-mean — so the JDK raster reproduces the per-block DC values
  * our decoder reads straight off the bitstream).
  */
class JpegDcSpec extends AnyFunSuite {

  private def pattern(nb: Int): Seq[Int] =
    (0 until nb).map(j => ((7 * j) % 32) - 16)

  test("DC decode matches the generator's pattern in closed form") {
    for ((w, h) <- Seq((16, 10), (24, 16), (40, 12), (7, 7), (8, 8), (41, 17))) {
      val bytes = Multimodal.jpegDcPatternBytes(w, h)
      val nb = ((w + 7) / 8) * ((h + 7) / 8)
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)), s"($w x $h): $got")
    }
  }

  test("DC decode agrees with the JDK's full IDCT decode block-for-block") {
    val (w, h) = (40, 16)
    val bytes = Multimodal.jpegDcPatternBytes(w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    val bw = (w + 7) / 8
    val nb = bw * ((h + 7) / 8)
    val d = pattern(nb)
    for (y <- 0 until h; x <- 0 until w) {
      val j = (y / 8) * bw + (x / 8)
      val expect = 128 + 2 * d(j) // 128 + dcq/8 with Q(DC)=16
      val got = img.getRaster.getSample(x, y, 0)
      assert(got == expect,
        s"pixel ($x,$y) in block $j: JDK=$got, DC-derived=$expect")
    }
  }

  test("the legacy all-zero fixture JPEGs decode to flat gray") {
    // ns_multimodal_meta's jpegBytes: every DC diff is category 0 and
    // AC is immediate EOB — dcq 0 everywhere, mean level 128
    val bytes = Multimodal.jpegBytes(32, 24)
    assert(Multimodal.jpegDcStats(bytes).contains((32L, 24L, 12L, 0L, 0L, 0L)))
  }

  test("COLOR (3-component) luma DC decode matches the closed form, " +
      "with and without chroma motion") {
    for ((w, h) <- Seq((16, 10), (40, 16), (7, 7), (41, 17));
         motion <- Seq(false, true)) {
      val bytes = Multimodal.jpegDcColorPatternBytes(w, h, motion)
      val nb = ((w + 7) / 8) * ((h + 7) / 8)
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      // Y stats are chroma-invariant — equality across the motion
      // variants proves chroma consumption leaves the luma stream in
      // sync (chroma DC categories 3/4 flow through the chroma-only
      // reverse-symbol DC table and length-2 EOB)
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)), s"($w x $h, motion=$motion): $got")
    }
  }

  test("COLOR DC decode agrees with the JDK's full color decode") {
    // chromaMotion=false => Cb=Cr=128 exactly, so RGB == (Y, Y, Y) with
    // zero color-convert error and the grayscale identity holds per pixel
    val (w, h) = (40, 16)
    val bytes = Multimodal.jpegDcColorPatternBytes(w, h, chromaMotion = false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated color JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    val bw = (w + 7) / 8
    val nb = bw * ((h + 7) / 8)
    val d = pattern(nb)
    for (y <- 0 until h; x <- 0 until w) {
      val j = (y / 8) * bw + (x / 8)
      val expect = 128 + 2 * d(j)
      val rgb = img.getRGB(x, y)
      for ((ch, shift) <- Seq(("r", 16), ("g", 8), ("b", 0))) {
        val got = (rgb >> shift) & 0xff
        assert(got == expect,
          s"$ch at ($x,$y) in block $j: JDK=$got, DC-derived=$expect")
      }
    }
  }

  test("4:2:0 subsampled luma DC decode matches the closed form, " +
      "restart-invariant") {
    for ((w, h) <- Seq((16, 16), (40, 26), (17, 23), (48, 32));
         rst <- Seq(0, 1, 3)) {
      val bytes = Multimodal.jpegDcSubPatternBytes(w, h, rst)
      val nb = ((w + 15) / 16) * ((h + 15) / 16) * 4
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      // the pattern is absolute, so the stats must be IDENTICAL across
      // restart intervals — a missed predictor reset or marker
      // misalignment shows up immediately
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)), s"($w x $h, rst=$rst): $got")
    }
  }

  test("4:2:2 / 4:4:0 luma DC decode matches the closed form per geometry") {
    for ((w, h) <- Seq((16, 16), (40, 26), (17, 23));
         (samp, bx, by) <- Seq((0x21, 16, 8), (0x12, 8, 16));
         rst <- Seq(0, 2)) {
      val bytes = Multimodal.jpegDcSubPatternBytes(w, h, rst, samp)
      val nb = ((w + bx - 1) / bx) * ((h + by - 1) / by) * 2
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)),
        s"($w x $h, samp=$samp%02x, rst=$rst): $got")
    }
  }

  test("4:2:2 DC decode agrees with the JDK's full decode") {
    // dims multiples of 16x8; MCU = two Y blocks side by side:
    // j = ((y/8)*mcusX + x/16)*2 + (x%16)/8
    val (w, h) = (48, 32)
    val bytes = Multimodal.jpegDcSubPatternBytes(w, h, 2, samp = 0x21)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated 4:2:2 JPEG")
    val mcusX = w / 16
    val d = pattern(mcusX * (h / 8) * 2)
    for (y <- 0 until h; x <- 0 until w) {
      val j = ((y / 8) * mcusX + x / 16) * 2 + (x % 16) / 8
      val expect = 128 + 2 * d(j)
      val got = (img.getRGB(x, y) >> 8) & 0xff
      assert(got == expect, s"pixel ($x,$y) in Y block $j: JDK=$got, want=$expect")
    }
  }

  test("4:1:1 luma DC decode matches the closed form per geometry") {
    for ((w, h) <- Seq((32, 8), (64, 26), (17, 23), (96, 32));
         rst <- Seq(0, 2)) {
      val bytes = Multimodal.jpegDcSubPatternBytes(w, h, rst, samp = 0x41)
      val nb = ((w + 31) / 32) * ((h + 7) / 8) * 4
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)), s"($w x $h, rst=$rst): $got")
    }
  }

  test("4:1:1 DC decode agrees with the JDK's full decode") {
    // dims multiples of 32x8; MCU = FOUR Y blocks side by side:
    // j = ((y/8)*mcusX + x/32)*4 + (x%32)/8
    val (w, h) = (64, 24)
    val bytes = Multimodal.jpegDcSubPatternBytes(w, h, 2, samp = 0x41)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated 4:1:1 JPEG")
    val mcusX = w / 32
    val d = pattern(mcusX * (h / 8) * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val j = ((y / 8) * mcusX + x / 32) * 4 + (x % 32) / 8
      val expect = 128 + 2 * d(j)
      val got = (img.getRGB(x, y) >> 8) & 0xff
      assert(got == expect, s"pixel ($x,$y) in Y block $j: JDK=$got, want=$expect")
    }
  }

  test("1x4 and 4x2 layouts still reject (acceptance boundary)") {
    // the generator writes any samp factor; only the decoder's
    // acceptance list decides — 4x1 is in, its neighbors are not
    assert(Multimodal.jpegDcStats(
      Multimodal.jpegDcSubPatternBytes(32, 32, 0, samp = 0x14)).isEmpty)
    assert(Multimodal.jpegDcStats(
      Multimodal.jpegDcSubPatternBytes(32, 32, 0, samp = 0x42)).isEmpty)
  }

  test("4:2:0 DC decode agrees with the JDK's full decode (with restarts)") {
    // chroma DC 0 => Cb=Cr=128 at any upsampling, so RGB == Y exactly;
    // dims multiples of 16 so no cropped padding blocks complicate the
    // pixel map: block j = (y/16 * mcusX + x/16) * 4 + (y%16)/8*2 + (x%16)/8
    val (w, h) = (48, 32)
    val bytes = Multimodal.jpegDcSubPatternBytes(w, h, restartEvery = 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated 4:2:0 JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    val mcusX = w / 16
    val nb = mcusX * (h / 16) * 4
    val d = pattern(nb)
    for (y <- 0 until h; x <- 0 until w) {
      val j = ((y / 16) * mcusX + (x / 16)) * 4 + ((y % 16) / 8) * 2 + (x % 16) / 8
      val expect = 128 + 2 * d(j)
      val got = (img.getRGB(x, y) >> 8) & 0xff // green channel
      assert(got == expect,
        s"pixel ($x,$y) in Y block $j: JDK=$got, DC-derived=$expect")
    }
  }

  test("PROGRESSIVE (SOF2) DC decode matches the closed form, restart-invariant") {
    for ((w, h) <- Seq((16, 10), (40, 16), (7, 7), (41, 17), (48, 32));
         rst <- Seq(0, 1, 3)) {
      val bytes = Multimodal.jpegDcProgPatternBytes(w, h, rst)
      val nb = ((w + 7) / 8) * ((h + 7) / 8)
      val want = pattern(nb).map(_ * 16L)
      val got = Multimodal.jpegDcStats(bytes)
      // the first scan carries d(j)>>1 and the refinement scan the low
      // bit, so an exact result PROVES the successive-approximation
      // reconstruction ((v<<1)|bit in two's complement) and the AC-scan
      // skip both work; the pattern is absolute, so stats must be
      // restart-invariant too
      assert(got.contains((w.toLong, h.toLong, nb.toLong,
        want.sum, want.min, want.max)), s"($w x $h, rst=$rst): $got")
    }
  }

  test("PROGRESSIVE DC decode agrees with the JDK's full progressive decode") {
    // chroma DC 0 => RGB == Y exactly, same identity as the color test
    val (w, h) = (40, 16)
    val bytes = Multimodal.jpegDcProgPatternBytes(w, h, restartEvery = 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated progressive JPEG")
    assert(img.getWidth == w && img.getHeight == h)
    val bw = (w + 7) / 8
    val d = pattern(bw * ((h + 7) / 8))
    for (y <- 0 until h; x <- 0 until w) {
      val j = (y / 8) * bw + (x / 8)
      val expect = 128 + 2 * d(j)
      val got = (img.getRGB(x, y) >> 8) & 0xff // green channel
      assert(got == expect,
        s"pixel ($x,$y) in block $j: JDK=$got, DC-derived=$expect")
    }
  }

  test("GRAYSCALE progressive (single-component SOF2) decodes exactly") {
    // spec-local builder: 1-component SOF2 with the same scan script
    // (DC first Al=1, one AC first scan as EOB runs, DC refine Ah=1) —
    // covers the nComp=1 progressive path the 3-component fixture
    // can't reach
    def grayProg(width: Int, height: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
      b(0xff, 0xd8)
      b(0xff, 0xdb, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => b(0x10))
      b(0xff, 0xc2, 0x00, 0x0b) // SOF2, 1 component
      b(0x08, (height >> 8) & 0xff, height & 0xff,
        (width >> 8) & 0xff, width & 0xff, 0x01, 0x01, 0x11, 0x00)
      b(0xff, 0xc4, 0x00, 0x19, 0x00) // DHT DC 0: len-3 codes 0-5
      b(0x00, 0x00, 0x06); (0 until 13).foreach(_ => b(0x00))
      (0 to 5).foreach(c => b(c))
      b(0xff, 0xc4, 0x00, 0x19, 0x10) // DHT AC 0: len-3 EOBn codes
      b(0x00, 0x00, 0x06); (0 until 13).foreach(_ => b(0x00))
      (0 to 5).foreach(k => b(k << 4))
      val ent = new java.io.ByteArrayOutputStream()
      var cur = 0; var nbits = 0
      def put(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          cur = (cur << 1) | ((v >> i) & 1L).toInt; nbits += 1
          if (nbits == 8) { ent.write(cur); if (cur == 0xff) ent.write(0); cur = 0; nbits = 0 }
          i -= 1
        }
      }
      def endScan(): Unit = {
        if (nbits > 0) { while (nbits < 8) { cur = (cur << 1) | 1; nbits += 1 }
          ent.write(cur); if (cur == 0xff) ent.write(0); cur = 0; nbits = 0 }
        out.write(ent.toByteArray); ent.reset()
      }
      val nb = ((width + 7) / 8) * ((height + 7) / 8)
      def d(j: Int) = ((7 * j) % 32) - 16
      // DC first, Al=1
      b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x01)
      var prev = 0
      (0 until nb).foreach { j =>
        val v = d(j) >> 1
        val diff = v - prev; prev = v
        val cat = if (diff == 0) 0
          else 64 - java.lang.Long.numberOfLeadingZeros(math.abs(diff).toLong)
        put(cat.toLong, 3)
        if (cat > 0) put(if (diff >= 0) diff.toLong
          else diff.toLong + (1L << cat) - 1, cat)
      }
      endScan()
      // AC first scan, all-zero AC as EOB runs
      b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x01, 0x3f, 0x00)
      var left = nb
      while (left > 0) {
        val chunk = math.min(left, 63)
        val k = 31 - java.lang.Integer.numberOfLeadingZeros(chunk)
        put(k.toLong, 3); if (k > 0) put((chunk - (1 << k)).toLong, k)
        left -= chunk
      }
      endScan()
      // DC refinement Ah=1 Al=0: one raw low bit per block
      b(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x10)
      (0 until nb).foreach(j => put((d(j) & 1).toLong, 1))
      endScan()
      b(0xff, 0xd9)
      out.toByteArray
    }
    for ((w, h) <- Seq((16, 10), (40, 16), (7, 7))) {
      val bytes = grayProg(w, h)
      val nb = ((w + 7) / 8) * ((h + 7) / 8)
      val want = pattern(nb).map(_ * 16L)
      assert(Multimodal.jpegDcStats(bytes).contains(
        (w.toLong, h.toLong, nb.toLong, want.sum, want.min, want.max)),
        s"gray progressive ($w x $h)")
    }
    // JDK agreement on the grayscale progressive stream
    val (w, h) = (40, 16)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(grayProg(w, h)))
    assert(img != null, "JDK could not decode the gray progressive JPEG")
    val bw = (w + 7) / 8
    val dd = pattern(bw * ((h + 7) / 8))
    for (y <- 0 until h; x <- 0 until w) {
      val expect = 128 + 2 * dd((y / 8) * bw + (x / 8))
      val got = img.getRaster.getSample(x, y, 0)
      assert(got == expect, s"pixel ($x,$y): JDK=$got, want=$expect")
    }
  }

  test("PROGRESSIVE streams with an incomplete DC refinement chain reject") {
    val full = Multimodal.jpegDcProgPatternBytes(24, 16, 0)
    assert(Multimodal.jpegDcStats(full).nonEmpty)
    // truncate before the FINAL scan (the DC refinement) and close with
    // EOI: DC low bits are unknown, so reject-never-mis-decode applies
    val lastSos = full.indices.findLast(i =>
      (full(i) & 0xff) == 0xff && i + 1 < full.length &&
        (full(i + 1) & 0xff) == 0xda).get
    val cut = full.take(lastSos).toArray ++ Array(0xff.toByte, 0xd9.toByte)
    assert(Multimodal.jpegDcStats(cut).isEmpty)
    // breaking the successive-approximation chain (refinement claims
    // Ah=2 where the first scan left Al=1) rejects too
    val badChain = full.clone()
    badChain(lastSos + 13) = 0x20.toByte // AhAl 0x10 -> 0x20
    assert(Multimodal.jpegDcStats(badChain).isEmpty)
  }

  test("non-baseline and malformed streams are rejected, never mis-decoded") {
    val good = Multimodal.jpegDcPatternBytes(16, 16)
    assert(Multimodal.jpegDcStats("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.jpegDcStats(good.take(20).toArray).isEmpty)
    // flip SOF0 (0xC0) to SOF2 (0xC2, progressive): the header is now
    // accepted, but the stream's single scan is a full-spectrum baseline
    // scan (Ss=0, Se=63) — not a legal progressive FIRST scan (must be
    // the DC scan, Se=0) — so the scan-progression contract rejects
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.jpegDcStats(prog).isEmpty)
    // truncate mid-entropy-data: reject (bit reader runs dry)
    assert(Multimodal.jpegDcStats(good.dropRight(6).toArray).isEmpty)
    // corrupt a segment LENGTH so payload reads run past the buffer:
    // must reject via the bounds/catch guard, not throw out of the task
    val dhtAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc4).get
    val hugeLen = good.clone()
    hugeLen(dhtAt + 2) = 0x7f.toByte // DHT claims a 32k payload
    assert(Multimodal.jpegDcStats(hugeLen).isEmpty)
    val shortLen = good.clone()
    shortLen(dhtAt + 3) = 0x05.toByte // DHT shorter than its own counts
    assert(Multimodal.jpegDcStats(shortLen).isEmpty)
    // mutating the SOF luma sampling factor of a 1x1-encoded stream: the
    // header itself is now ACCEPTED (2x1 = 4:2:2 is a supported layout),
    // but the entropy stream was encoded as 1x1, so the MCU walk desyncs
    // and the decode rejects via the bounds/NonFatal guard
    val color = Multimodal.jpegDcColorPatternBytes(16, 16, chromaMotion = false)
    val sub = color.clone()
    val csofAt = sub.indices.find(i =>
      (sub(i) & 0xff) == 0xff && (sub(i + 1) & 0xff) == 0xc0).get
    sub(csofAt + 11) = 0x21.toByte // Y sampling 2x1
    assert(Multimodal.jpegDcStats(sub).isEmpty)
    val sub2 = Multimodal.jpegDcSubPatternBytes(32, 32, 0)
    val ssofAt = sub2.indices.find(i =>
      (sub2(i) & 0xff) == 0xff && (sub2(i + 1) & 0xff) == 0xc0).get
    sub2(ssofAt + 11) = 0x42.toByte // Y sampling 4x2 (4:1:1-ish)
    assert(Multimodal.jpegDcStats(sub2).isEmpty)
  }
}
