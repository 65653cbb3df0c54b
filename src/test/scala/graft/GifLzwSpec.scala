package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The GIF LZW-decode tier: [[Multimodal.gifIndexStats]] must really
  * LZW-decompress — verified two independent ways: (a) closed form
  * against the generator's index pattern, (b) against the JDK's own
  * GIF decode of the same bytes (the gray ramp palette makes every
  * decoded pixel value equal its color index).
  */
class GifLzwSpec extends AnyFunSuite {

  private def idx(p: Long): Long = ((7 * p) % 32) * 8

  test("GIF LZW decode matches the generator's pattern in closed form") {
    for ((w, h) <- Seq((16, 10), (40, 16), (7, 7), (1, 1), (64, 48), (97, 31))) {
      val bytes = Multimodal.gifPatternBytes(w, h)
      val n = w.toLong * h
      val vals = (0L until n).map(idx)
      val got = Multimodal.gifIndexStats(bytes)
      assert(got.contains((w.toLong, h.toLong, n,
        vals.sum, vals.min, vals.max)), s"($w x $h): $got")
    }
  }

  test("a large image crosses LZW width bumps and stays exact") {
    // 256x256 = 65536 pixels of a period-32 pattern: the dictionary
    // grows through the 9->10->11->12 bit widths (and possibly a
    // mid-stream clear) — any width-accounting bug desyncs immediately
    val (w, h) = (256, 256)
    val bytes = Multimodal.gifPatternBytes(w, h)
    val n = w.toLong * h
    val vals = (0L until n).map(idx)
    assert(Multimodal.gifIndexStats(bytes)
      .contains((w.toLong, h.toLong, n, vals.sum, vals.min, vals.max)))
  }

  test("GIF decode agrees with the JDK's own decode pixel-for-pixel") {
    val (w, h) = (40, 16)
    val bytes = Multimodal.gifPatternBytes(w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the generated GIF")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = y.toLong * w + x
      val expect = idx(p).toInt
      val got = (img.getRGB(x, y) >> 8) & 0xff // green of the gray ramp
      assert(got == expect, s"pixel ($x,$y): JDK=$got, LZW-derived=$expect")
    }
  }

  test("ANIMATED census decodes every frame and sums the GCE delays") {
    for ((w, h, nf) <- Seq((16, 10), (20, 12), (7, 7)).zip(Seq(2, 3, 5))
        .map { case ((w, h), nf) => (w, h, nf) }) {
      val bytes = Multimodal.gifAnimBytes(w, h, nf)
      val n = w.toLong * h
      val frameSum = (0L until n).map(idx).sum
      val delays = (1 to nf).map(10L * _).sum
      assert(Multimodal.gifAnimStats(bytes).contains(
        (nf.toLong, w.toLong, h.toLong, nf * n, nf * frameSum, delays)),
        s"($w x $h x $nf)")
    }
    // the single-frame census agrees with gifIndexStats on frame count 1
    val one = Multimodal.gifAnimBytes(16, 10, 1)
    assert(Multimodal.gifAnimStats(one).exists(_._1 == 1L))
  }

  test("malformed animations reject whole-file, never a partial census") {
    val good = Multimodal.gifAnimBytes(16, 10, 3)
    // truncate inside the LAST frame: no partial 2-frame answer allowed
    assert(Multimodal.gifAnimStats(good.dropRight(8).toArray).isEmpty)
    // mismatched frame geometry rejects: patch the 2nd descriptor's width.
    // Descriptors are at known offsets only in the fixture layout, so
    // find the SECOND 0x2c that begins a descriptor (after the first
    // frame's data): scan from past the first descriptor.
    val first = good.indices.find(i => (good(i) & 0xff) == 0x2c && i > 781).get
    val second = good.indices.find(i => (good(i) & 0xff) == 0x2c && i > first + 10).get
    val bad = good.clone()
    bad(second + 5) = ((16 + 1) & 0xff).toByte // width 17 != frame 1's 16
    // either rejects on geometry or on the now-wrong pixel count — it
    // must not return a census
    assert(Multimodal.gifAnimStats(bad).isEmpty)
  }

  test("malformed and unsupported GIFs reject, never mis-decode") {
    val good = Multimodal.gifPatternBytes(16, 16)
    assert(Multimodal.gifIndexStats("not a gif".getBytes).isEmpty)
    assert(Multimodal.gifIndexStats(good.take(30).toArray).isEmpty)
    // truncate mid-entropy-data: the exact-pixel-count check rejects
    assert(Multimodal.gifIndexStats(good.dropRight(8).toArray).isEmpty)
    // corrupt a code mid-stream so an out-of-dictionary code appears:
    // flip high bits in the middle of the LZW payload
    val desc = good.indices.find(i => (good(i) & 0xff) == 0x2c &&
      i > 13 + 768).get // first image separator after the GCT
    val corrupt = good.clone()
    val mid = desc + 11 + 20 // inside the first data sub-block
    corrupt(mid) = (corrupt(mid) ^ 0xff).toByte
    // either rejects outright or still satisfies the exact-pixel-count
    // contract — it must never throw out of the call
    Multimodal.gifIndexStats(corrupt)
  }

  test("a first frame that is a SUBRECTANGLE of the screen reports ITS dims") {
    // patch the logical-screen dims to be larger than the image
    // descriptor's: width/height must be the descriptor's (iw, ih) —
    // the pixels the stats cover — so width*height == n_pixels holds
    val (w, h) = (16, 10)
    val bytes = Multimodal.gifPatternBytes(w, h)
    val patched = bytes.clone()
    patched(6) = 100.toByte; patched(7) = 0 // screen width 100
    patched(8) = 50.toByte; patched(9) = 0 // screen height 50
    val n = w.toLong * h
    val vals = (0L until n).map(idx)
    assert(Multimodal.gifIndexStats(patched)
      .contains((w.toLong, h.toLong, n, vals.sum, vals.min, vals.max)))
  }

  test("INTERLACED GIFs decode to the same order-invariant stats") {
    for ((w, h) <- Seq((16, 10), (40, 16), (64, 48))) {
      val bytes = Multimodal.gifPatternBytes(w, h, interlaced = true)
      val n = w.toLong * h
      val vals = (0L until n).map(idx)
      // the four-pass row order permutes the raster; index stats are
      // order-invariant, so interlaced and sequential fixtures agree
      assert(Multimodal.gifIndexStats(bytes)
        .contains((w.toLong, h.toLong, n, vals.sum, vals.min, vals.max)))
    }
  }

  test("INTERLACED fixture deinterlaces correctly in the JDK's decode") {
    // proves the fixture writes genuinely pass-ordered rows: the JDK
    // deinterlaces, so pixel (x,y) must carry idx at RASTER position
    val (w, h) = (40, 16)
    val bytes = Multimodal.gifPatternBytes(w, h, interlaced = true)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode the interlaced GIF")
    for (y <- 0 until h; x <- 0 until w) {
      val expect = idx(y.toLong * w + x).toInt
      val got = (img.getRGB(x, y) >> 8) & 0xff
      assert(got == expect, s"pixel ($x,$y): JDK=$got, want=$expect")
    }
  }
}
