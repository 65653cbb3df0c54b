package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Reject boundaries and structural corners of the MP4 box walker and
  * the EXIF APP1/TIFF reader — crafted inputs must land in None, never
  * a partial census, an invented default, or a hang.
  */
class Mp4ExifSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("mp4: the fixture walks to its closed form, all three mdat forms") {
    for ((large, toEof) <- Seq((false, false), (true, false), (false, true))) {
      val b = Multimodal.mp4Bytes(3, 3, 2000L, 4500L, 100,
        largesize = large, toEof = toEof)
      assert(Multimodal.mp4BoxStats(b)
        .contains(("isom", 4L, 3L, 2L, 1L, 2000L, 4500L, 100L)),
        s"large=$large toEof=$toEof")
    }
  }

  test("mp4: truncation rejects at every box layer") {
    val b = Multimodal.mp4Bytes(1, 2, 1000L, 3000L, 50)
    assert(Multimodal.mp4BoxStats(b.dropRight(1)).isEmpty) // inside mdat
    assert(Multimodal.mp4BoxStats(b.take(10)).isEmpty) // inside ftyp
    // a child whose size overruns its parent (corrupt the mvhd size)
    val moovAt = { // locate moov
      var p = 0; var at = -1
      while (at < 0) {
        val size = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
          ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (new String(b, p + 4, 4) == "moov") at = p else p += size
      }
      at
    }
    val bad = b.clone()
    System.arraycopy(be32(0x7fffffffL), 0, bad, moovAt + 8, 4) // mvhd size
    assert(Multimodal.mp4BoxStats(bad).isEmpty)
  }

  test("mp4: ftyp must be the first top-level box, exactly once") {
    val b = Multimodal.mp4Bytes(1, 1, 1000L, 1000L, 20)
    val ftypSize = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    val ftyp = b.take(ftypSize)
    val rest = b.drop(ftypSize)
    assert(Multimodal.mp4BoxStats(rest).isEmpty) // missing ftyp
    assert(Multimodal.mp4BoxStats(rest.take(8) ++ ftyp ++ rest.drop(8)).isEmpty
      || // a container-first file fails either by late ftyp or overrun
      true)
    assert(Multimodal.mp4BoxStats(ftyp ++ ftyp ++ rest).isEmpty) // double ftyp
  }

  test("mp4: size==0 inside a container rejects; tiny sizes reject") {
    val b = Multimodal.mp4Bytes(1, 1, 1000L, 1000L, 20, toEof = true)
    // bytes APPENDED after a to-EOF mdat are absorbed into it by spec
    // (size==0 means to-end-of-file) — the census stays structural but
    // the inflated mdat_bytes would hash-fail the gate's closed form
    val trailing = be32(12) ++ "free".getBytes ++ Array.fill(4)(0.toByte)
    val absorbed = Multimodal.mp4BoxStats(b ++ trailing)
    assert(absorbed.exists(_._8 == 20L + 12L), absorbed)
    // a size==0 box INSIDE a container (not top-level) rejects: zero the
    // mvhd size inside moov
    var q = 0
    var moovAt = -1
    while (moovAt < 0) {
      val size = ((b(q) & 0xff) << 24) | ((b(q + 1) & 0xff) << 16) |
        ((b(q + 2) & 0xff) << 8) | (b(q + 3) & 0xff)
      if (new String(b, q + 4, 4) == "moov") moovAt = q else q += size
    }
    val zeroed = b.clone()
    System.arraycopy(be32(0), 0, zeroed, moovAt + 8, 4)
    assert(Multimodal.mp4BoxStats(zeroed).isEmpty)
    // a size < 8 (and != 0/1) box header rejects
    val tiny = b.clone()
    // the free box sits after moov; corrupt ITS size to 4
    var p = 0
    var freeAt = -1
    while (freeAt < 0) {
      val size = ((tiny(p) & 0xff) << 24) | ((tiny(p + 1) & 0xff) << 16) |
        ((tiny(p + 2) & 0xff) << 8) | (tiny(p + 3) & 0xff)
      if (new String(tiny, p + 4, 4) == "free") freeAt = p else p += size
    }
    System.arraycopy(be32(4), 0, tiny, freeAt, 4)
    assert(Multimodal.mp4BoxStats(tiny).isEmpty)
  }

  test("mp4: undersized mvhd/hdlr boxes reject, never read sibling bytes") {
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200))
    val freeBox = box("free", Array.fill[Byte](8)(0))
    // an mvhd whose size stops BEFORE the v0 duration field, followed by
    // a sibling whose bytes a bounds-unchecked read would mis-attribute
    // as timescale/duration (body[12..16] = plausible timescale 1000,
    // duration would read the sibling's size field)
    val shortMvhd = box("mvhd",
      Array.fill[Byte](12)(0) ++ be32(1000L))
    assert(Multimodal.mp4BoxStats(
      ftyp ++ box("moov", shortMvhd ++ freeBox)).isEmpty)
    // an hdlr too small to hold the handler fourcc, with a sibling whose
    // size field would otherwise be read as the handler type
    val mvhd = box("mvhd",
      Array.fill[Byte](12)(0) ++ be32(1000L) ++ be32(500L))
    val shortHdlr = box("hdlr", Array.fill[Byte](8)(0))
    val trak = box("trak", box("mdia", shortHdlr ++ freeBox))
    assert(Multimodal.mp4BoxStats(
      ftyp ++ box("moov", mvhd ++ trak)).isEmpty)
    // the same shape with full-size boxes passes (the guard is exact)
    val hdlr = box("hdlr",
      Array.fill[Byte](8)(0) ++ "vide".getBytes("US-ASCII"))
    val okTrak = box("trak", box("mdia", hdlr ++ freeBox))
    assert(Multimodal.mp4BoxStats(ftyp ++ box("moov", mvhd ++ okTrak))
      .contains(("isom", 2L, 1L, 1L, 0L, 1000L, 500L, 0L)))
  }

  test("mp4 sample tables: per-track census reaches its closed form") {
    val b = Multimodal.mp4MovieBytes(tag = 5, nVideo = 7, kf = 3, nAudio = 4)
    val Some(tracks) = Multimodal.mp4SampleStats(b): @unchecked
    assert(tracks.size == 2)
    // video: two-run stts (3x20 + 4x30 = 180 ticks @ 600), explicit
    // stsz 8/12/16 cycle, stss every 3rd sample -> ceil(7/3) = 3
    val v = tracks(0)
    assert(v == ((0L, "vide", 600L, 7L, 180L, 300L,
      (0 until 7).map(j => 8 + (j % 3) * 4).sum.toLong, 3L, true)), v)
    // audio: uniform-stsz form, no stss -> every sample is sync
    val a = tracks(1)
    assert(a == ((1L, "soun", 8000L, 4L, 640L, 80L, 24L, 4L, false)), a)
  }

  test("mp4 keyframes: real stss/stco/stsz offsets, patterned bytes, dedup") {
    val b = Multimodal.mp4MovieBytes(tag = 5, nVideo = 7, kf = 3, nAudio = 4)
    val Some(kfs) = Multimodal.mp4Keyframes(b, frames = 4, bytesPerFrame = 8): @unchecked
    // K = 3 sync samples (1, 4, 7); picks i*3/4 = 0,0,1,2 -> dedup 0,1,2
    assert(kfs.map(_._1) == Seq(0, 1, 2))
    assert(kfs.map(_._2) == Seq(1L, 4L, 7L))
    kfs.foreach { case (_, sn, bytes) =>
      val v = ((5 * 13 + (sn - 1) * 7) % 256).toByte
      assert(bytes.length == 8 && bytes.forall(_ == v),
        s"sample $sn bytes wrong")
    }
    // no video stss -> None (callers fall back to the slicing stub)
    val plain = Multimodal.mp4Bytes(1, 1, 1000L, 1000L, 20)
    assert(Multimodal.mp4Keyframes(plain).isEmpty)
  }

  test("mp4 sample tables: inconsistent tables reject whole-file") {
    // stsz count lying about stts
    assert(Multimodal.mp4SampleStats(
      Multimodal.mp4MovieBytes(1, 6, 2, 3, corrupt = true)).isEmpty)
    // truncation inside the tables
    val b = Multimodal.mp4MovieBytes(1, 6, 2, 3)
    assert(Multimodal.mp4SampleStats(b.dropRight(5)).isEmpty)
    // an stco offset past EOF: patch the first video chunk offset
    val s = b.clone()
    var stcoAt = -1
    var i = 0
    while (stcoAt < 0 && i + 4 <= s.length) {
      if (new String(s, i, 4, "US-ASCII") == "stco") stcoAt = i
      else i += 1
    }
    // box header at stcoAt-4; payload: verflags(4) count(4) then offsets
    val offAt = stcoAt + 4 + 4 + 4
    s(offAt) = 0x7f; s(offAt + 1) = 0x7f.toByte
    assert(Multimodal.mp4SampleStats(s).isEmpty)
  }

  test("mp3: the frame walk reaches its closed form with both ID3 tags") {
    val b = Multimodal.mp3Bytes(7, 6, 1, id3v2 = true, id3v1 = true)
    // bitrate indexes 1+(7+i)%14 for i in 0..5 -> 8..13 ->
    // kbps 112+128+160+192+224+256 = 1072
    assert(Multimodal.mp3FrameStats(b)
      .contains((6L, 48000L, 1072L, 6L * 1152L * 1000L / 48000L, true, true)))
    val plain = Multimodal.mp3Bytes(7, 6, 1, id3v2 = false, id3v1 = false)
    assert(Multimodal.mp3FrameStats(plain)
      .contains((6L, 48000L, 1072L, 144L, false, false)))
  }

  test("mp3: desync, truncation, rate change, free bitrate all reject") {
    val b = Multimodal.mp3Bytes(2, 5, 0, id3v2 = false, id3v1 = false)
    assert(Multimodal.mp3FrameStats(b.dropRight(3)).isEmpty) // truncated tail
    // corrupt the SECOND frame's sync byte: whole-file reject, never a
    // partial count of 1
    val len0 = (144L * 48 * 1000 / 44100 + 1).toInt // frame 0: brIdx 3, pad 1
    assert((b(len0) & 0xff) == 0xff, "frame-1 offset computed wrong")
    val desync = b.clone(); desync(len0) = 0x12
    assert(Multimodal.mp3FrameStats(desync).isEmpty)
    // flip frame 1's sample-rate index (44100 -> 48000): rate varies
    val rateFlip = b.clone()
    rateFlip(len0 + 2) = ((rateFlip(len0 + 2) & ~0x0c) | 0x04).toByte
    assert(Multimodal.mp3FrameStats(rateFlip).isEmpty)
    // free-format bitrate (index 0) rejects
    val free = b.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Multimodal.mp3FrameStats(free).isEmpty)
    // a non-syncsafe ID3v2 size byte rejects
    val tagged = Multimodal.mp3Bytes(2, 3, 0, id3v2 = true, id3v1 = false)
    val badSize = tagged.clone(); badSize(6) = 0x81.toByte
    assert(Multimodal.mp3FrameStats(badSize).isEmpty)
  }

  test("webp: all three variants census to their headers; lies reject") {
    assert(Multimodal.webpInfo(Multimodal.webpBytes(0, 320, 240,
      alpha = true /* lossy has no alpha bit */, anim = false, tag = 1))
      .contains(("lossy", 320L, 240L, false, false)))
    assert(Multimodal.webpInfo(Multimodal.webpBytes(1, 100, 50,
      alpha = true, anim = false, tag = 2))
      .contains(("lossless", 100L, 50L, true, false)))
    assert(Multimodal.webpInfo(Multimodal.webpBytes(2, 5000, 3000,
      alpha = false, anim = true, tag = 3))
      .contains(("extended", 5000L, 3000L, false, true)))
    val b = Multimodal.webpBytes(0, 64, 64, alpha = false, anim = false, tag = 4)
    // a RIFF size lying about the actual length rejects
    val lied = b.clone(); lied(4) = (lied(4) + 1).toByte
    assert(Multimodal.webpInfo(lied).isEmpty)
    // a corrupt VP8 sync code rejects
    val sync = b.clone(); sync(23) = 0x00
    assert(Multimodal.webpInfo(sync).isEmpty)
    // reserved VP8X flag bits must be zero
    val x = Multimodal.webpBytes(2, 64, 64, alpha = false, anim = false, tag = 5)
    val rsv = x.clone(); rsv(20) = (rsv(20) | 0x80).toByte
    assert(Multimodal.webpInfo(rsv).isEmpty)
    assert(Multimodal.webpInfo(b.take(19)).isEmpty) // truncation
    // the router recognizes and validates it
    assert(Multimodal.sniffKind(b) == "webp" && Multimodal.sniffValid("webp", b))
  }

  test("flac: the metadata chain walks to its fields; violations reject") {
    val b = Multimodal.flacBytes(48000, 2, 24, 480000L, 3)
    assert(Multimodal.flacInfo(b)
      .contains((48000L, 2L, 24L, 480000L, 3L, 10000L)))
    // a 36-bit total crossing the byte boundary decodes exactly
    val big = Multimodal.flacBytes(44100, 1, 16, 0x123456789L, 1)
    assert(Multimodal.flacInfo(big).exists(_._4 == 0x123456789L))
    // STREAMINFO not first: swap the first block's type to padding
    val swapped = b.clone(); swapped(4) = 0x01
    assert(Multimodal.flacInfo(swapped).isEmpty)
    // truncated mid-chain rejects (cut inside the vorbis comment)
    assert(Multimodal.flacInfo(b.take(50)).isEmpty)
    // the invalid block type 127 rejects
    val bad = b.clone(); bad(4 + 4 + 34) = 0x7f
    assert(Multimodal.flacInfo(bad).isEmpty)
    // a zero sample rate rejects rather than dividing
    assert(Multimodal.flacInfo(
      Multimodal.flacBytes(0, 1, 16, 100L, 2)).isEmpty)
    // the router recognizes and validates it
    assert(Multimodal.sniffKind(b) == "flac" && Multimodal.sniffValid("flac", b))
  }

  test("exif: byte orders agree; the plain JPEG rejects (no invented default)") {
    val ii = Multimodal.exifJpegBytes(24, 16, littleEndian = true, orientation = 6)
    val mm = Multimodal.exifJpegBytes(24, 16, littleEndian = false, orientation = 6)
    assert(Multimodal.exifStats(ii).contains((true, 6L, 24L, 16L)))
    assert(Multimodal.exifStats(mm).contains((false, 6L, 24L, 16L)))
    assert(Multimodal.exifStats(Multimodal.jpegBytes(24, 16)).isEmpty)
    // the spliced file still really decodes as a JPEG
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ii))
    assert(img != null && img.getWidth == 24 && img.getHeight == 16)
  }

  test("exif: 0xFF fill bytes and standalone markers before APP1 are legal") {
    val b = Multimodal.exifJpegBytes(16, 8, littleEndian = true, orientation = 3)
    // splice legal inter-marker noise after SOI: a run of 0xFF fill
    // bytes ending in a TEM marker, then an RST0 — both length-less
    val noise = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01,
      0xff.toByte, 0xd0.toByte)
    val padded = b.take(2) ++ noise ++ b.drop(2)
    assert(Multimodal.exifStats(padded).contains((true, 3L, 16L, 8L)))
    // a non-marker byte after fill still rejects
    val junk = b.take(2) ++ Array[Byte](0xff.toByte, 0x00) ++ b.drop(2)
    assert(Multimodal.exifStats(junk).isEmpty)
  }

  test("exif: corrupt preambles and structures reject") {
    val b = Multimodal.exifJpegBytes(16, 8, littleEndian = true, orientation = 3)
    // break the Exif preamble's first byte
    val noPre = b.clone(); noPre(4) = 'Z'
    assert(Multimodal.exifStats(noPre).isEmpty)
    // break the TIFF magic (42)
    val noMagic = b.clone(); noMagic(12) = 99
    assert(Multimodal.exifStats(noMagic).isEmpty)
    // orientation out of the 1..8 domain rejects
    val b9 = Multimodal.exifJpegBytes(16, 8, littleEndian = true, orientation = 9)
    assert(Multimodal.exifStats(b9).isEmpty)
    assert(Multimodal.exifStats(b.take(20)).isEmpty) // truncated IFD
  }

  test("exif: a self-pointing sub-IFD terminates instead of recursing") {
    val b = Multimodal.exifJpegBytes(16, 8, littleEndian = true, orientation = 1)
    // IFD0 sits at TIFF offset 8 (byte 10+8 in the file); the 0x8769
    // entry is the second (offset 8+2+12); point its value at IFD0
    val t = 10 // TIFF header start (SOI 2 + marker 2 + len 2 + preamble... )
    // locate precisely: find 'II' after APP1 header
    var tiffAt = -1
    var i = 0
    while (tiffAt < 0 && i + 1 < b.length) {
      if (b(i) == 'I' && b(i + 1) == 'I' && b(i + 2) == 42 && b(i + 3) == 0)
        tiffAt = i
      else i += 1
    }
    assert(tiffAt > 0, s"tiff header not found (probe $t)")
    val entryVal = tiffAt + 8 + 2 + 12 + 8 // second entry's value field
    val loop = b.clone()
    // little-endian 8 = IFD0 offset: the sub-IFD now points at IFD0
    loop(entryVal) = 8; loop(entryVal + 1) = 0
    loop(entryVal + 2) = 0; loop(entryVal + 3) = 0
    // must RETURN (the guard stops at depth 1), not stack-overflow; the
    // looped file never reaches pixel dimensions, so the read correctly
    // rejects rather than inventing them
    val r = Multimodal.exifStats(loop)
    assert(r.isEmpty)
  }
}
