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

  test("a crafted negative TAR size rejects instead of looping forever") {
    // octal parseLong accepts a leading '-', and the header checksum is
    // attacker-chosen so it still validates: size = -1024 would net zero
    // loop progress (pos += 512 then += -512) without the explicit guard
    val tar = Multimodal.tarBytes(0, 1)
    val neg = "-0000002000" // octal -2000 = -1024
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    System.arraycopy(neg, 0, tar, 124, neg.length)
    // re-forge the checksum so the size field is the only lie
    java.util.Arrays.fill(tar, 148, 156, ' '.toByte)
    var hsum = 0L
    for (i <- 0 until 512) hsum += tar(i) & 0xff
    val cs = java.lang.Long.toOctalString(hsum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, tar, 148, 6)
    tar(154) = 0; tar(155) = ' '
    assert(Multimodal.tarCensus(tar).isEmpty)
  }

  test("WARC census walks gzip members and frames records to the closed form") {
    for ((tag, nr) <- Seq((0, 3), (4, 7), (11, 1))) {
      var total = 0L
      var sum = 0L
      var resp = 0L
      for (r <- 0 until nr) {
        val payload = (s"record $r of crawl $tag " * (r + 1))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        total += payload.length
        sum += payload.map(_ & 0xff).map(_.toLong).sum
        if (r % 3 == 0) resp += 1
      }
      assert(Multimodal.warcCensus(Multimodal.warcBytes(tag, nr))
        .contains((nr.toLong, nr.toLong, resp, total, sum)), s"tag=$tag nr=$nr")
    }
  }

  test("the JDK agrees the WARC fixture's gzip member chain concatenates") {
    // GZIPInputStream reads concatenated members transparently — its
    // total decompressed output must equal our member walk's framing input
    val b = Multimodal.warcBytes(5, 4)
    val gin = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var r = gin.read(buf)
    while (r > 0) { out.write(buf, 0, r); r = gin.read(buf) }
    val text = out.toString("US-ASCII")
    assert(text.startsWith("WARC/1.0\r\n"))
    assert("WARC-Type: response".r.findAllIn(text).size == 2) // r = 0, 3
    assert("WARC/1\\.0".r.findAllIn(text).size == 4)
  }

  test("malformed WARC members and records reject whole-file") {
    val ok = Multimodal.warcBytes(2, 3)
    // truncated final member: the inflate starves -> reject
    assert(Multimodal.warcCensus(ok.dropRight(15).toArray).isEmpty)
    // forged member CRC rejects even though framing would parse
    val crcBad = ok.clone()
    crcBad(ok.length - 8) = (crcBad(ok.length - 8) ^ 0x01).toByte
    assert(Multimodal.warcCensus(crcBad).isEmpty)
    // forged ISIZE rejects
    val szBad = ok.clone()
    szBad(ok.length - 1) = (szBad(ok.length - 1) ^ 0x01).toByte
    assert(Multimodal.warcCensus(szBad).isEmpty)
    // trailing garbage after the last member rejects (bad next magic)
    assert(Multimodal.warcCensus(ok ++ "junk".getBytes).isEmpty)
    // a gzip member whose payload is NOT WARC-framed rejects
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("HTTP/1.1 200 OK\r\n\r\nnot warc".getBytes)
    gz.close()
    assert(Multimodal.warcCensus(bos.toByteArray).isEmpty)
    // a record with a forged (short) Content-Length breaks the
    // terminator alignment -> reject, never a partial census
    val one = Multimodal.warcBytes(9, 1)
    val gin = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(one))
    val rec = new String(gin.readAllBytes(), java.nio.charset.StandardCharsets.US_ASCII)
    val forged = rec.replaceFirst("Content-Length: (\\d+)", "Content-Length: 3")
    val rbos = new java.io.ByteArrayOutputStream()
    val rgz = new java.util.zip.GZIPOutputStream(rbos)
    rgz.write(forged.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    rgz.close()
    assert(Multimodal.warcCensus(rbos.toByteArray).isEmpty)
    assert(Multimodal.warcCensus("plain text".getBytes).isEmpty)
    assert(Multimodal.warcCensus(Array.emptyByteArray).isEmpty)
  }

  test("WARC HTTP extraction parses status/headers/bodies; forged lengths reject") {
    val b = Multimodal.warcHttpBytes(3, 7) // records 0..6; r%3==2 are requests
    val Some(rows) = Multimodal.warcHttpStats(b)
    assert(rows.length == 5) // 7 - 7/3 = 5 responses
    for ((row, i) <- rows.zipWithIndex) {
      val body = s"body $i of crawl 3 " * (i + 1)
      val wantStatus = Seq(200L, 404L, 301L)(i % 3)
      assert(row == ((i.toLong, wantStatus, 3L,
        body.length.toLong, body.getBytes.map(_ & 0xff).map(_.toLong).sum)),
        s"response $i: $row")
    }
    // a forged HTTP Content-Length (framed body unchanged) rejects the file
    val gin = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(
      Multimodal.warcHttpBytes(1, 1)))
    val rec = new String(gin.readAllBytes(), java.nio.charset.StandardCharsets.US_ASCII)
    // the SECOND Content-Length line is the HTTP header (the first is WARC's)
    val idx = rec.indexOf("Content-Length", rec.indexOf("Content-Length") + 1)
    val forged = rec.substring(0, idx) +
      rec.substring(idx).replaceFirst("Content-Length: (\\d+)", "Content-Length: 2")
    val rbos = new java.io.ByteArrayOutputStream()
    val rgz = new java.util.zip.GZIPOutputStream(rbos)
    rgz.write(forged.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    rgz.close()
    assert(Multimodal.warcHttpStats(rbos.toByteArray).isEmpty)
    // a non-HTTP response payload rejects
    assert(Multimodal.warcHttpStats(Multimodal.warcBytes(2, 3)).isEmpty)
    // truncation rejects like the census
    assert(Multimodal.warcHttpStats(b.dropRight(12).toArray).isEmpty)
  }

  test("chunked transfer-encoding de-chunks to framing-invariant body stats") {
    // 7 responses: resp 3 is chunked (resp % 4 == 3) — the closed-form
    // row tuples are IDENTICAL to the Content-Length framing's, which is
    // the invariance under test (plus real multi-chunk walking: bodies
    // split at 3..7-byte boundaries)
    val b = Multimodal.warcHttpBytes(4, 11) // 8 responses; resp 3 and 7 chunked
    val Some(rows) = Multimodal.warcHttpStats(b)
    assert(rows.length == 8)
    for ((row, i) <- rows.zipWithIndex) {
      val body = s"body $i of crawl 4 " * (i + 1)
      assert(row == ((i.toLong, Seq(200L, 404L, 301L)(i % 3), 3L,
        body.length.toLong, body.getBytes.map(_ & 0xff).map(_.toLong).sum)),
        s"response $i: $row")
    }
    // malformed chunk streams reject whole-file: rebuild resp-3's record
    // with (a) a corrupted hex size line, (b) trailing bytes after the
    // 0 chunk — both must land in None, never a partial body
    def rezip(rec: String): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(o)
      gz.write(rec.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      gz.close()
      o.toByteArray
    }
    val one = Multimodal.warcHttpBytes(9, 4) // responses 0,1,3(req),... resp idx 3 absent; use 7 records
    val seven = Multimodal.warcHttpBytes(9, 7)
    val gin = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(seven))
    val all = new String(gin.readAllBytes(), java.nio.charset.StandardCharsets.US_ASCII)
    assert(all.contains("Transfer-Encoding: chunked"))
    val recStart = all.lastIndexOf("WARC/1.0", all.indexOf("Transfer-Encoding: chunked"))
    val recEnd = all.indexOf("WARC/1.0", recStart + 1) match {
      case -1 => all.length
      case x => x
    }
    val chunkedRec = all.substring(recStart, recEnd)
    // (a) corrupt the first hex size digit to a non-hex char (it sits
    // after the SECOND CRLFCRLF: WARC headers, then HTTP headers); the
    // WARC Content-Length is unchanged so only the chunk grammar objects
    val hexAt = chunkedRec.indexOf("\r\n\r\n",
      chunkedRec.indexOf("\r\n\r\n") + 4) + 4
    val badHex = chunkedRec.substring(0, hexAt) + "x" + chunkedRec.substring(hexAt + 1)
    assert(Multimodal.warcHttpStats(rezip(badHex)).isEmpty)
    // (b) ambiguous framing: add a Content-Length beside the chunked TE
    // (WARC's own record length re-fixed so only the HTTP layer objects)
    val amb = chunkedRec.replaceFirst("Transfer-Encoding: chunked",
      "Transfer-Encoding: chunked\r\nContent-Length: 5")
    val oldLen = "Content-Length: (\\d+)".r.findFirstMatchIn(chunkedRec).get.group(1).toInt
    val amb2 = amb.replaceFirst(s"Content-Length: $oldLen",
      s"Content-Length: ${oldLen + (amb.length - chunkedRec.length)}")
    assert(Multimodal.warcHttpStats(rezip(amb2)).isEmpty)
    assert(one.nonEmpty) // silence unused warning
  }

  test("WARC->HTML chain: failure granularity is per-document vs whole-file") {
    // 5 responses (idx 1,4 are 404s; idx 1,3 chunked): 200s extract to
    // the closed-form page, 404s get zeroed filtered rows
    val b = Multimodal.warcHtmlBytes(7, 5)
    val Some(rows) = Multimodal.warcHtmlTexts(b)
    assert(rows.length == 5)
    assert(rows.map(_._2) == Vector(200L, 404L, 200L, 200L, 404L))
    for (p <- Seq(0, 2, 3)) {
      val r = rows(p)
      assert(r._3 == s"Crawl & Page ${70 + p}", r)
      assert(r._4 == 1 + (7 + p) % 4 && r._5 == 2 + (7 + p) % 3, r)
      assert(r._8, r)
    }
    assert(rows(1) == ((1L, 404L, "", 0L, 0L, 0L, 0L, false)))
    // the chunked page (idx 3) extracts IDENTICALLY to what the same
    // page yields un-chunked — framing invariance through the chain
    val direct = graft.operators.HtmlText
      .extract(graft.operators.HtmlText.htmlPage(73, 2 + 10 % 3, 1 + 10 % 4)).get
    assert(rows(3)._6 == direct.text.length.toLong)
    // a structurally malformed HTML body (unterminated comment) fails
    // THAT document only: rebuild response 0's record with a bad body,
    // WARC + HTTP lengths kept consistent so only the HTML layer objects
    def gz(rec: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(rec); g.close(); o.toByteArray
    }
    val badHtml = "<p>never closed <!-- oops"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${badHtml.length}\r\n\r\n" + badHtml
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0002-000000000099>\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n"
    val mixed = gz(rec.getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++
      Multimodal.warcHtmlBytes(7, 2)
    val Some(rows2) = Multimodal.warcHtmlTexts(mixed)
    assert(rows2.length == 3)
    assert(rows2(0) == ((0L, 200L, "", 0L, 0L, 0L, 0L, false))) // that doc only
    assert(rows2(1)._8) // the rest of the file still extracts
    // container/HTTP violations still reject whole-file
    assert(Multimodal.warcHtmlTexts(b.dropRight(9).toArray).isEmpty)
    val forged = http.replaceFirst(s"Content-Length: ${badHtml.length}",
      s"Content-Length: ${badHtml.length + 3}")
    val rec2 = rec.replace(http, forged)
    assert(Multimodal.warcHtmlTexts(
      gz(rec2.getBytes(java.nio.charset.StandardCharsets.US_ASCII))).isEmpty)
  }

  test("a >= 65535-entry archive reads its count from the ZIP64 EOCD") {
    // the 16-bit EOCD total-entries field saturates at 0xFFFF; the JDK
    // writes the real count to the ZIP64 EOCD record — without the
    // sentinel branch every crawl-scale archive would be rejected whole
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.setLevel(0)
    val n = 65536
    var e = 0
    while (e < n) {
      zos.putNextEntry(new java.util.zip.ZipEntry(f"e$e%05x"))
      zos.closeEntry()
      e += 1
    }
    zos.close()
    assert(Multimodal.zipCensus(bos.toByteArray).contains((n.toLong, 0L, 0L)))
  }
}
