package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The archive-census tier: [[Multimodal.zipCensus]] must really
  * inflate every ZIP entry and [[Multimodal.tarCensus]] must parse
  * ustar headers with VERIFIED checksums — both pinned against the
  * generators' closed-form entry scheme and the
  * reject-never-miscount boundary.
  */
class ArchiveSpec extends AnyFunSuite {

  private def expected(tag: Int, ne: Int): (Long, Long, Long) = {
    var total = 0L
    var sum = 0L
    for (e <- 0 until ne) {
      val payload = (s"entry $e of archive $tag " * (e + 1))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      total += payload.length
      sum += payload.map(_ & 0xff).map(_.toLong).sum
    }
    (ne.toLong, total, sum)
  }

  test("ZIP census inflates every entry to the closed form") {
    for ((tag, ne) <- Seq((0, 3), (7, 7), (13, 1))) {
      assert(Multimodal.zipCensus(Multimodal.zipBytes(tag, ne))
        .contains(expected(tag, ne)), s"tag=$tag ne=$ne")
    }
  }

  test("TAR census parses ustar headers and verified checksums") {
    for ((tag, ne) <- Seq((1, 4), (8, 7), (21, 1))) {
      assert(Multimodal.tarCensus(Multimodal.tarBytes(tag, ne))
        .contains(expected(tag, ne)), s"tag=$tag ne=$ne")
    }
  }

  test("the JDK agrees the TAR fixture is well-formed per entry sizes") {
    // cross-parse: the sizes the ustar octal fields declare must equal
    // the payload lengths the generator wrote — walk independently
    val b = Multimodal.tarBytes(5, 4)
    var pos = 0
    var seen = 0
    while (!(0 until 512).forall(i => b(pos + i) == 0)) {
      val size = java.lang.Long.parseLong(
        new String(b, pos + 124, 12).trim, 8)
      val want = (s"entry $seen of archive 5 " * (seen + 1)).length
      assert(size == want, s"entry $seen size")
      pos += 512 + ((size + 511) / 512).toInt * 512
      seen += 1
    }
    assert(seen == 4)
  }

  test("malformed archives reject whole-file, never a partial census") {
    val zip = Multimodal.zipBytes(3, 4)
    // losing the tail (central directory + part of the last entry)
    // must NOT yield a partial census — the EOCD verification catches
    // even truncations that land cleanly between entries, which a
    // streaming reader alone reports as a smaller valid archive
    assert(Multimodal.zipCensus(zip.dropRight(30).toArray).isEmpty)
    assert(Multimodal.zipCensus(zip.take(zip.length / 2).toArray).isEmpty)
    // a forged EOCD count (one fewer entry) rejects
    val forged = zip.clone()
    val eocd = forged.indices.reverse.find(i =>
      (forged(i) & 0xff) == 0x50 && (forged(i + 1) & 0xff) == 0x4b &&
        (forged(i + 2) & 0xff) == 0x05 && (forged(i + 3) & 0xff) == 0x06).get
    forged(eocd + 10) = 3
    forged(eocd + 8) = 3
    assert(Multimodal.zipCensus(forged).isEmpty)
    assert(Multimodal.zipCensus("not a zip at all".getBytes).isEmpty)
    val tar = Multimodal.tarBytes(3, 4)
    // flip a payload byte: the ustar header checksum still holds (it
    // covers the header only) but a truncation mid-payload rejects
    assert(Multimodal.tarCensus(tar.dropRight(1200).toArray).isEmpty)
    // corrupt a header checksum digit
    val bad = tar.clone()
    bad(148) = (bad(148) ^ 0x01).toByte
    assert(Multimodal.tarCensus(bad).isEmpty)
    assert(Multimodal.tarCensus("plain text, no ustar".getBytes).isEmpty)
  }
}
