package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, PdfText}

/** The PDF reader's structural corners and reject boundaries: classic
  * xref walk, FlateDecode, text-operator extraction with escapes, and
  * the whole-file rejects (encrypted, xref stream, broken offsets,
  * unsupported filters) — never a partial extraction.
  */
class PdfTextSpec extends AnyFunSuite {

  private def latin1(s: String) = s.getBytes("ISO-8859-1")

  test("fixture extracts to its closed form, plain and FlateDecode") {
    for (flate <- Seq(false, true); pages <- Seq(1, 3)) {
      val b = PdfText.pdfBytes(7, pages, flate)
      val r = PdfText.pdfText(b)
      assert(r.isDefined, s"flate=$flate pages=$pages")
      val (np, ops, text) = r.get
      assert(np == pages && ops == pages * 4L)
      val expect = (0 until pages)
        .map(i => s"Page $i of pdf 7: alpha beta gamma (7) hex!")
        .mkString("\n")
      assert(text == expect, s"flate=$flate pages=$pages: $text")
    }
  }

  test("string escapes: octal, specials, line continuation, nesting, hex pad") {
    // hand-build a single-page PDF with a custom content stream
    def withContent(content: String): Array[Byte] = {
      val base = PdfText.pdfBytes(0, 1, flate = false)
      // splice: regenerate via the generator's object layout is
      // simpler than patching — build a fresh minimal file here
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(latin1(s))
      val offs = scala.collection.mutable.Map.empty[Int, Int]
      w("%PDF-1.4\n")
      def obj(n: Int)(body: => Unit): Unit = {
        offs(n) = out.size(); w(s"$n 0 obj\n"); body; w("\nendobj\n")
      }
      obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
      obj(2) { w("<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>") }
      obj(3) { w("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>") }
      obj(4) { w(s"<< /Length ${content.length} >>\nstream\n$content\nendstream") }
      val xrefAt = out.size()
      w("xref\n0 5\n0000000000 65535 f \n")
      (1 to 4).foreach(n => w(f"${offs(n)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      assert(base.nonEmpty) // silence unused warning paranoia
      out.toByteArray
    }
    // octal \101 = 'A'; \\ and \( \); backslash-newline continuation;
    // nested balanced parens pass through; odd hex digit pads 0
    val b = withContent(
      "BT (\\101B\\\\C) Tj ((nested) ok) Tj (li\\\nne) Tj <414> Tj ET")
    val Some((np, ops, text)) = PdfText.pdfText(b): @unchecked
    assert(np == 1 && ops == 4)
    assert(text == "AB\\C (nested) ok line A@")
  }

  test("xref streams + object streams: the modern layout extracts identically") {
    for (pred <- Seq(false, true); flate <- Seq(false, true); pages <- Seq(1, 3)) {
      val classic = PdfText.pdfText(PdfText.pdfBytes(9, pages, flate))
      val modern = PdfText.pdfText(PdfText.pdfBytes(9, pages, flate,
        xrefStream = true, predictor = pred))
      assert(modern.isDefined, s"pred=$pred flate=$flate pages=$pages rejected")
      assert(modern == classic,
        s"pred=$pred flate=$flate pages=$pages: layouts diverge")
    }
    // encrypted xref-stream files reject the same way classic ones do
    assert(PdfText.pdfText(PdfText.pdfBytes(9, 2, flate = true,
      encrypted = true, xrefStream = true)).isEmpty)
  }

  test("xref-stream structural damage rejects whole-file") {
    val b = PdfText.pdfBytes(4, 2, flate = true, xrefStream = true,
      predictor = true)
    val s = new String(b, "ISO-8859-1")
    // corrupt the /W widths: entries misparse -> reject
    val wAt = s.indexOf("/W [1 2 2]")
    assert(wAt > 0)
    val badW = b.clone()
    badW(wAt + 4) = '9'
    assert(PdfText.pdfText(badW).isEmpty)
    // truncate inside the xref stream payload
    assert(PdfText.pdfText(b.dropRight(30)).isEmpty)
    // corrupt the object stream's /First offset
    val fAt = s.indexOf("/First ")
    val badF = b.clone()
    badF(fAt + 7) = '9'
    assert(PdfText.pdfText(badF).isEmpty ||
      PdfText.pdfText(badF) != PdfText.pdfText(b)) // misparse never silent
  }

  test("encrypted, xref-stream-shaped, and broken-xref files reject whole-file") {
    assert(PdfText.pdfText(
      PdfText.pdfBytes(3, 2, flate = true, encrypted = true)).isEmpty)
    assert(PdfText.pdfText(
      PdfText.pdfBytes(3, 2, flate = false, brokenXref = true)).isEmpty)
    // point startxref at an OBJECT (the PDF 1.5 xref-stream layout):
    // scope-rejected rather than misread
    val b = PdfText.pdfBytes(3, 1, flate = false)
    val s = new String(b, "ISO-8859-1")
    val objAt = s.indexOf("1 0 obj")
    val sxAt = s.lastIndexOf("startxref")
    val patched = s.substring(0, sxAt) + s"startxref\n$objAt\n%%EOF\n"
    assert(PdfText.pdfText(latin1(patched)).isEmpty)
  }

  test("truncation and structural damage reject at every layer") {
    val b = PdfText.pdfBytes(5, 2, flate = true)
    assert(PdfText.pdfText(b.take(20)).isEmpty) // no startxref
    assert(PdfText.pdfText(b.dropRight(12)).isEmpty) // startxref offset lost
    assert(PdfText.pdfText(latin1("not a pdf at all")).isEmpty)
    // corrupt the flate stream body: inflate fails -> whole-file None
    val s = new String(b, "ISO-8859-1")
    val st = s.indexOf("stream\n") + 7
    val bad = b.clone()
    bad(st) = (bad(st) ^ 0xff).toByte
    bad(st + 1) = (bad(st + 1) ^ 0xff).toByte
    assert(PdfText.pdfText(bad).isEmpty)
  }

  test("unsupported filters and DecodeParms reject") {
    def onePage(streamDict: String, content: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(x: String): Unit = out.write(latin1(x))
      val offs = scala.collection.mutable.Map.empty[Int, Int]
      w("%PDF-1.4\n")
      def obj(n: Int)(body: => Unit): Unit = {
        offs(n) = out.size(); w(s"$n 0 obj\n"); body; w("\nendobj\n")
      }
      obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
      obj(2) { w("<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>") }
      obj(3) { w("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>") }
      obj(4) { w(s"<< /Length ${content.length}$streamDict >>\nstream\n" +
        content + "\nendstream") }
      val xrefAt = out.size()
      w("xref\n0 5\n0000000000 65535 f \n")
      (1 to 4).foreach(n => w(f"${offs(n)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }
    val content = "BT (x) Tj ET"
    assert(PdfText.pdfText(onePage("", content)).nonEmpty) // control
    assert(PdfText.pdfText(
      onePage(" /Filter /RunLengthDecode", content)).isEmpty)
    assert(PdfText.pdfText(
      onePage(" /Filter /DCTDecode", content)).isEmpty)
    // a DECLARED supported filter over data that is not actually
    // encoded that way must reject, never mis-decode
    assert(PdfText.pdfText(
      onePage(" /Filter /LZWDecode", content)).isEmpty)
    assert(PdfText.pdfText(
      onePage(" /Filter /FlateDecode /DecodeParms << /Predictor 12 >>",
        content)).isEmpty)
  }

  test("LZW and ASCIIHex content filters, single and chained") {
    val ref = PdfText.pdfText(PdfText.pdfBytes(6, 2, flate = false))
    assert(ref.nonEmpty)
    for ((lzw, flate, ahx) <- Seq((true, false, false), (false, false, true),
        (true, false, true), (false, true, true))) {
      val got = PdfText.pdfText(PdfText.pdfBytes(6, 2, flate = flate,
        lzw = lzw, ahx = ahx))
      assert(got == ref, s"lzw=$lzw flate=$flate ahx=$ahx diverged")
    }
  }

  test("the sniffer routes and validates the pdf family") {
    val good = PdfText.pdfBytes(9, 2, flate = true)
    assert(Multimodal.sniffKind(good) == "pdf")
    assert(Multimodal.sniffValid("pdf", good))
    val enc = PdfText.pdfBytes(9, 2, flate = true, encrypted = true)
    assert(Multimodal.sniffKind(enc) == "pdf" && !Multimodal.sniffValid("pdf", enc))
    assert(Multimodal.sniffKind(latin1("plain text")) == "unknown")
  }

  test("indirect /Length and multi-stream pages resolve") {
    // /Length as a reference, and /Contents as an ARRAY of two streams
    // whose texts join with the page separator semantics
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(latin1(x))
    val offs = scala.collection.mutable.Map.empty[Int, Int]
    w("%PDF-1.4\n")
    def obj(n: Int)(body: => Unit): Unit = {
      offs(n) = out.size(); w(s"$n 0 obj\n"); body; w("\nendobj\n")
    }
    val c1 = "BT (first) Tj ET"
    val c2 = "BT (second) Tj ET"
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj(2) { w("<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>") }
    obj(3) { w("<< /Type /Page /Parent 2 0 R /Contents [ 4 0 R 6 0 R ] >>") }
    obj(4) { w(s"<< /Length 5 0 R >>\nstream\n$c1\nendstream") }
    obj(5) { w(s"${c1.length}") }
    obj(6) { w(s"<< /Length ${c2.length} >>\nstream\n$c2\nendstream") }
    val xrefAt = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    (1 to 6).foreach(n => w(f"${offs(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val Some((np, ops, text)) = PdfText.pdfText(out.toByteArray): @unchecked
    assert(np == 1 && ops == 2 && text == "first second")
  }
}
