package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The G.711 companded-audio tier: [[Multimodal.g711Stats]] must expand
  * µ-law/A-law code words through the standard segment/mantissa
  * formulas — pinned against the PUBLISHED reference points of both
  * laws (the values every conforming G.711 table agrees on), verified
  * in closed form against the generator's full-period code-word walk,
  * and bounded by the reject-never-mis-decode contract.
  */
class G711Spec extends AnyFunSuite {

  private def ulaw(v: Int): Long = {
    val u = (~v) & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) (0x84 - t).toLong else (t - 0x84).toLong
  }

  private def alaw(v: Int): Long = {
    val a = v ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case _ => (t + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t.toLong else (-t).toLong
  }

  test("µ-law reference points (the published table's corners)") {
    assert(ulaw(0x00) == -32124) // maximal negative
    assert(ulaw(0x80) == 32124) // maximal positive
    assert(ulaw(0xff) == 0) // quietest positive code
    assert(ulaw(0x7f) == 0) // quietest negative code (±0 both map to 0)
    assert(ulaw(0xfe) == 8) // one step up
  }

  test("A-law reference points") {
    assert(alaw(0x55) == -8) // quietest negative
    assert(alaw(0xd5) == 8) // quietest positive (sign bit = positive)
    assert(alaw(0x2a) == -32256) // maximal negative
    assert(alaw(0xaa) == 32256) // maximal positive
  }

  test("decode folds the generator's full-period walk exactly, both laws") {
    for ((tag, law) <- Seq((7, ulaw _), (6, alaw _)); n <- Seq(200, 1000)) {
      val bytes = Multimodal.wavG711Bytes(8000, n, tag)
      val want = (0 until n).map(i => law((7 * i + 3) % 256))
      assert(Multimodal.g711Stats(bytes)
        .contains((tag.toLong, n.toLong, want.sum, want.min, want.max)),
        s"tag=$tag n=$n")
    }
  }

  test("every code word round-trips through the WAV container") {
    // n = 256 with the (7i+3) mod 256 walk covers all 256 code words
    // (gcd(7, 256) = 1); the fold must see the true global min/max
    val bytes = Multimodal.wavG711Bytes(8000, 256, 7)
    val all = (0 until 256).map(ulaw)
    val got = Multimodal.g711Stats(bytes).get
    assert(got._4 == all.min && got._5 == all.max)
    assert(got._4 == -32124 && got._5 == 32124)
  }

  test("IEEE-float PCM decodes to exact 2^8-scaled integers") {
    val n = 200
    val bytes = Multimodal.wavFloatToneBytes(8000, n)
    val want = (0 until n).map(i => ((((7 * i + 3) % 33) - 16) * 16).toLong)
    assert(Multimodal.floatPcmStats(bytes)
      .contains((n.toLong, want.sum, want.min, want.max)))
    // int PCM (tag 1) is not float; 16-bit float claims reject
    assert(Multimodal.floatPcmStats(
      Multimodal.wavToneBytes(8000, 100, 5, 0, 4)).isEmpty)
    val bad = bytes.clone()
    bad(34) = 16 // bits-per-sample byte
    assert(Multimodal.floatPcmStats(bad).isEmpty)
    assert(Multimodal.floatPcmStats(bytes.dropRight(10).toArray).isEmpty)
  }

  test("non-G.711 and malformed containers reject") {
    assert(Multimodal.g711Stats("junk".getBytes).isEmpty)
    // linear PCM (tag 1) is NOT G.711 — the pcm tiers own it
    assert(Multimodal.g711Stats(Multimodal.wavToneBytes(8000, 100, 5, 0, 4)).isEmpty)
    // truncated data chunk
    val good = Multimodal.wavG711Bytes(8000, 200, 6)
    assert(Multimodal.g711Stats(good.dropRight(30).toArray).isEmpty)
    // a 16-bit claim on companded data rejects (bits must be 8)
    val bad = good.clone()
    bad(34) = 16 // fmt chunk bits-per-sample byte
    assert(Multimodal.g711Stats(bad).isEmpty)
  }
}
