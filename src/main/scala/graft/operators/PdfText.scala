package graft.operators

import scala.collection.mutable

/** PDF text extraction — the single most common document container in
  * real training corpora, and the 14th family in the multimodal
  * router. A from-scratch reader of the honest production subset,
  * written against the public PDF 1.7 spec (ISO 32000-1):
  *
  *   - classic cross-reference TABLES (`xref` sections + `trailer`
  *     dicts, incremental-update `/Prev` chains followed newest-first
  *     so later sections win);
  *   - content streams stored plain or `/FlateDecode`-compressed (the
  *     zlib Inflater the PNG tier already trusts);
  *   - the text-showing operators `Tj`, `'`, `"`, and `TJ` inside
  *     BT..ET blocks, with full literal-string escape decoding
  *     (\n \r \t \b \f \( \) \\, octal \ddd, line continuations,
  *     balanced nested parens) and hex strings;
  *   - simple-font byte semantics: string bytes map to text via
  *     Latin-1 (no /ToUnicode CMaps — composite-font PDFs extract
  *     their raw bytes, which is exactly what a dedup/quality pass
  *     hashes anyway).
  *
  * REJECT boundaries (whole-file None, the WAV-walker contract — never
  * a partial extraction, never a hang):
  *
  *   - encrypted documents (`/Encrypt` in any trailer);
  *   - PDF 1.5+ cross-reference STREAMS and object streams (the
  *     startxref target must be an `xref` keyword, not an object);
  *   - any stream filter other than none / FlateDecode, or any
  *     `/DecodeParms` (predictors unsupported);
  *   - structural damage: bad header, unparseable startxref/xref,
  *     offsets out of bounds, reference cycles, missing /Root//Pages.
  *
  * Extraction contract: per content stream, the shown strings of each
  * text op join with a single space (TJ's array strings concatenate,
  * kerning numbers ignored); page texts join with '\n'. Deterministic
  * and closed-form replayable, which is what the gate oracle does.
  *
  * Scale: the parseAll narrow shape — one partition-mapped walk per
  * file; page count, op count and the extracted text leave the map
  * side, payload bytes never shuffle.
  */
object PdfText {

  private val MaxObjects = 100000
  private val MaxPages = 10000
  private val MaxDepth = 64
  private val MaxPrev = 16

  sealed private trait Obj
  private case object PNull extends Obj
  private final case class PBool(v: Boolean) extends Obj
  private final case class PInt(v: Long) extends Obj
  private final case class PReal(v: Double) extends Obj
  private final case class PStr(bytes: Array[Byte]) extends Obj
  private final case class PName(v: String) extends Obj
  private final case class PArr(items: Vector[Obj]) extends Obj
  private final case class PDict(m: Map[String, Obj]) extends Obj
  private final case class PRef(num: Long, gen: Long) extends Obj
  private final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  private final class Bad extends RuntimeException("bad pdf")
  private def bad(): Nothing = throw new Bad

  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent PDF object lexer/parser over the raw bytes. */
  private final class Lexer(b: Array[Byte], var pos: Int) {
    def atEnd: Boolean = pos >= b.length
    def peek: Int = if (pos < b.length) b(pos) & 0xff else -1

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (pos < b.length && isWs(b(pos) & 0xff)) pos += 1
        if (pos < b.length && (b(pos) & 0xff) == '%') {
          while (pos < b.length && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else go = false
      }
    }

    /** Next run of regular characters (keyword / number / operator). */
    def token(): String = {
      skipWs()
      val st = pos
      while (pos < b.length && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff))
        pos += 1
      if (pos == st) bad()
      new String(b, st, pos - st, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def expect(kw: String): Unit = if (token() != kw) bad()

    def parseLong(): Long = {
      val t = token()
      try t.toLong catch { case _: NumberFormatException => bad() }
    }

    private def parseName(): PName = {
      // at '/'
      pos += 1
      val sb = new java.lang.StringBuilder
      while (pos < b.length && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < b.length) {
          val hex = Integer.parseInt(
            new String(b, pos + 1, 2, java.nio.charset.StandardCharsets.US_ASCII), 16)
          sb.append(hex.toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      // at '('
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xff
        if (c == '\\') {
          if (pos + 1 >= b.length) bad()
          val e = b(pos + 1) & 0xff
          e match {
            case 'n' => out.write('\n'); pos += 2
            case 'r' => out.write('\r'); pos += 2
            case 't' => out.write('\t'); pos += 2
            case 'b' => out.write('\b'); pos += 2
            case 'f' => out.write('\f'); pos += 2
            case '(' => out.write('('); pos += 2
            case ')' => out.write(')'); pos += 2
            case '\\' => out.write('\\'); pos += 2
            case '\r' => // line continuation: swallow \r or \r\n
              pos += 2
              if (pos < b.length && b(pos) == '\n') pos += 1
            case '\n' => pos += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0; pos += 1
              while (n < 3 && pos < b.length &&
                  (b(pos) & 0xff) >= '0' && (b(pos) & 0xff) <= '7') {
                v = v * 8 + ((b(pos) & 0xff) - '0'); pos += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 2 // spec: drop the backslash
          }
        } else if (c == '(') { depth += 1; out.write(c); pos += 1 }
        else if (c == ')') {
          depth -= 1
          if (depth > 0) out.write(c)
          pos += 1
        } else { out.write(c); pos += 1 }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      // at '<' (single)
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xff
        pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: final digit padded with 0
          done = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) bad()
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      PStr(out.toByteArray)
    }

    /** One PDF value. `num gen R` collapses to PRef via bounded lookahead. */
    def parseValue(depth: Int): Obj = {
      if (depth > MaxDepth) bad()
      skipWs()
      if (atEnd) bad()
      val c = peek
      if (c == '/') parseName()
      else if (c == '(') parseLiteralString()
      else if (c == '[') {
        pos += 1
        val items = Vector.newBuilder[Obj]
        skipWs()
        while (peek != ']') { items += parseValue(depth + 1); skipWs(); if (atEnd) bad() }
        pos += 1
        PArr(items.result())
      } else if (c == '<') {
        if (pos + 1 < b.length && (b(pos + 1) & 0xff) == '<') {
          pos += 2
          val m = Map.newBuilder[String, Obj]
          skipWs()
          while (peek != '>') {
            if (peek != '/') bad()
            val PName(k) = parseName(): @unchecked
            m += k -> parseValue(depth + 1)
            skipWs()
            if (atEnd) bad()
          }
          pos += 1
          if (peek != '>') bad()
          pos += 1
          PDict(m.result())
        } else parseHexString()
      } else if (c == ']' || c == '>' || c == ')' || c == '{' || c == '}') bad()
      else {
        val t = token()
        t match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case _ =>
            val isInt = t.nonEmpty && t.forall(ch => ch.isDigit || ch == '+' || ch == '-') &&
              t.exists(_.isDigit)
            if (isInt) {
              val v = try t.toLong catch { case _: NumberFormatException => bad() }
              // lookahead for `gen R`
              val save = pos
              val r = try {
                skipWs()
                if (pos < b.length && (b(pos) & 0xff).toChar.isDigit) {
                  val g = token()
                  if (g.forall(_.isDigit)) {
                    skipWs()
                    val s2 = pos
                    if (!atEnd && !isDelim(peek) && token() == "R") Some(PRef(v, g.toLong))
                    else { pos = s2; None }
                  } else None
                } else None
              } catch { case _: Bad => None }
              r match {
                case Some(ref) => ref
                case None => pos = save; PInt(v)
              }
            } else {
              val d = try t.toDouble catch { case _: NumberFormatException => bad() }
              PReal(d)
            }
        }
      }
    }
  }

  /** Parse + extract. Returns (nPages, nTextOps, text) or None. */
  def pdfText(b: Array[Byte]): Option[(Long, Long, String)] =
    try pdfTextImpl(b)
    catch { case scala.util.control.NonFatal(_) => None }

  private def pdfTextImpl(b: Array[Byte]): Option[(Long, Long, String)] = {
    if (b.length < 16) return None
    val header = new String(b, 0, math.min(8, b.length),
      java.nio.charset.StandardCharsets.US_ASCII)
    if (!header.startsWith("%PDF-")) return None

    // locate the LAST `startxref` in the tail window
    val tailFrom = math.max(0, b.length - 2048)
    val tail = new String(b, tailFrom, b.length - tailFrom,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return None
    val lx = new Lexer(b, tailFrom + sx + "startxref".length)
    val xrefAt = lx.parseLong()
    if (xrefAt < 0 || xrefAt >= b.length) return None

    // walk xref tables (newest first; /Prev chains; later sections win)
    val xref = mutable.Map.empty[Long, Long] // objNum -> byte offset
    var rootRef: Obj = PNull
    var at = xrefAt
    var hops = 0
    while (at >= 0) {
      if (hops > MaxPrev) return None
      hops += 1
      val l = new Lexer(b, at.toInt)
      // a PDF 1.5 cross-reference STREAM puts an indirect object here —
      // out of scope, reject rather than misread
      if (l.token() != "xref") return None
      // subsections until the `trailer` keyword
      var t = l.token()
      while (t != "trailer") {
        val start = try t.toLong catch { case _: NumberFormatException => return None }
        val count = l.parseLong()
        if (count < 0 || count > MaxObjects || xref.size > MaxObjects) return None
        var i = 0L
        while (i < count) {
          val off = l.parseLong()
          l.parseLong() // generation
          val kind = l.token()
          if (kind != "n" && kind != "f") return None
          if (kind == "n" && !xref.contains(start + i)) {
            if (off < 0 || off >= b.length) return None
            xref(start + i) = off
          }
          i += 1
        }
        t = l.token()
      }
      val trailer = l.parseValue(0) match {
        case d: PDict => d
        case _ => return None
      }
      if (trailer.m.contains("Encrypt")) return None // encrypted: reject
      if (rootRef == PNull) rootRef = trailer.m.getOrElse("Root", PNull)
      at = trailer.m.get("Prev") match {
        case Some(PInt(p)) if p >= 0 && p < b.length => p
        case Some(_) => return None
        case None => -1L
      }
    }
    if (rootRef == PNull) return None

    // indirect-object resolution with memo + cycle guard
    val cache = mutable.Map.empty[Long, Obj]
    val inFlight = mutable.Set.empty[Long]
    def parseIndirect(num: Long): Obj = {
      val off = xref.getOrElse(num, bad())
      val l = new Lexer(b, off.toInt)
      if (l.parseLong() != num) bad()
      l.parseLong() // gen
      l.expect("obj")
      val v = l.parseValue(0)
      l.skipWs()
      v match {
        case d: PDict if !l.atEnd && {
            val save = l.pos
            val isStream = try l.token() == "stream" catch { case _: Bad => false }
            if (!isStream) l.pos = save
            isStream
          } =>
          // after `stream`: optional \r then required \n
          if (!l.atEnd && l.peek == '\r') l.pos += 1
          if (l.atEnd || l.peek != '\n') bad()
          l.pos += 1
          val len = resolve(d.m.getOrElse("Length", bad()), 0) match {
            case PInt(n) if n >= 0 => n
            case _ => bad()
          }
          if (l.pos.toLong + len > b.length) bad()
          val raw = java.util.Arrays.copyOfRange(b, l.pos, l.pos + len.toInt)
          PStream(d, raw)
        case other => other
      }
    }
    def resolve(o: Obj, depth: Int): Obj = o match {
      case PRef(n, _) =>
        if (depth > MaxDepth) bad()
        cache.getOrElseUpdate(n, {
          if (!xref.contains(n)) PNull
          else {
            if (inFlight(n)) bad() // reference cycle
            inFlight += n
            try parseIndirect(n) finally inFlight -= n
          }
        }) match {
          case r: PRef => resolve(r, depth + 1)
          case x => x
        }
      case x => x
    }

    val root = resolve(rootRef, 0) match { case d: PDict => d; case _ => return None }
    val pagesRoot = resolve(root.m.getOrElse("Pages", return None), 0) match {
      case d: PDict => d
      case _ => return None
    }

    // page-tree walk: /Pages interior nodes, /Page leaves, in Kids order
    val pages = Vector.newBuilder[PDict]
    var nPages = 0L
    def walk(node: PDict, depth: Int): Unit = {
      if (depth > MaxDepth) bad()
      node.m.get("Type") match {
        case Some(PName("Pages")) =>
          val kids = resolve(node.m.getOrElse("Kids", bad()), 0) match {
            case PArr(items) => items
            case _ => bad()
          }
          kids.foreach { k =>
            resolve(k, 0) match {
              case d: PDict => walk(d, depth + 1)
              case _ => bad()
            }
          }
        case Some(PName("Page")) =>
          nPages += 1
          if (nPages > MaxPages) bad()
          pages += node
        case _ => bad()
      }
    }
    walk(pagesRoot, 0)

    // decode each page's content stream(s)
    def streamBytes(st: PStream): Array[Byte] = {
      if (st.dict.m.contains("DecodeParms") || st.dict.m.contains("DP")) bad()
      resolve(st.dict.m.getOrElse("Filter", PNull), 0) match {
        case PNull => st.raw
        case PName("FlateDecode") => inflate(st.raw)
        case PArr(Vector()) => st.raw
        case PArr(Vector(PName("FlateDecode"))) => inflate(st.raw)
        case _ => bad() // unsupported filter: reject, never misread
      }
    }
    var nTextOps = 0L
    val pageTexts = pages.result().map { pg =>
      val contents = resolve(pg.m.getOrElse("Contents", PNull), 0) match {
        case PNull => Vector.empty[PStream]
        case st: PStream => Vector(st)
        case PArr(items) => items.map(resolve(_, 0)).map {
          case st: PStream => st
          case _ => bad()
        }
        case _ => bad()
      }
      // a page's streams form ONE content stream (spec: whitespace joint)
      val joined = contents.map(streamBytes)
      val buf = new java.io.ByteArrayOutputStream()
      joined.zipWithIndex.foreach { case (cb, i) =>
        if (i > 0) buf.write('\n')
        buf.write(cb)
      }
      val (ops, text) = extractShownText(buf.toByteArray)
      nTextOps += ops
      text
    }
    Some((nPages, nTextOps, pageTexts.mkString("\n")))
  }

  /** Raw-inflate a FlateDecode stream (zlib-wrapped per spec). */
  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 3))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) bad()
        out.write(buf, 0, n)
        if (out.size() > (64 << 20)) bad() // decompression-bomb guard
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => bad() }
    finally inf.end()
  }

  /** Scan a decoded content stream for BT..ET text-showing operators.
    * Returns (op count, extracted text) — shown strings joined by a
    * single space, TJ array strings concatenated.
    */
  private def extractShownText(cb: Array[Byte]): (Long, String) = {
    val l = new Lexer(cb, 0)
    var inText = false
    var ops = 0L
    val out = new java.lang.StringBuilder
    val operands = mutable.ArrayBuffer.empty[Obj]
    def append(bytes: Array[Byte]): Unit = {
      if (out.length > 0) out.append(' ')
      out.append(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    while ({ l.skipWs(); !l.atEnd }) {
      val c = l.peek
      if (c == '(' || c == '<' || c == '[' || c == '/') {
        operands += l.parseValue(0)
      } else if (c == ')' || c == ']' || c == '>' || c == '{' || c == '}') {
        // stray delimiter in a content stream: skip (lenient — content
        // damage must not reject the whole document once decoded)
        l.pos += 1
        operands.clear()
      } else {
        val t = l.token()
        t match {
          case "BT" => inText = true; operands.clear()
          case "ET" => inText = false; operands.clear()
          case "Tj" | "'" | "\"" if inText =>
            operands.reverseIterator.collectFirst { case PStr(s) => s }
              .foreach { s => ops += 1; append(s) }
            operands.clear()
          case "TJ" if inText =>
            operands.reverseIterator.collectFirst { case PArr(items) => items }
              .foreach { items =>
                ops += 1
                val sb = new java.io.ByteArrayOutputStream()
                items.foreach { case PStr(s) => sb.write(s); case _ => () }
                append(sb.toByteArray)
              }
            operands.clear()
          case _ =>
            // a number keeps accumulating as an operand; any other
            // operator consumes its operands
            if (t.forall(ch => ch.isDigit || ch == '+' || ch == '-' || ch == '.') &&
                t.exists(_.isDigit))
              operands += PReal(0.0)
            else operands.clear()
        }
      }
    }
    (ops, out.toString)
  }

  // ---------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------

  /** Minimal-but-conformant classic-xref PDF: catalog + page tree +
    * `nPages` pages, each with one content stream holding four text
    * ops (a Tj, a kerned TJ, a Tj with escaped parens, a hex-string
    * Tj). Per-page extraction closed form:
    * `Page <i> of pdf <tag>: alpha beta gamma (<tag>) hex!`, pages
    * joined by '\n'. When `flate`, content streams are
    * FlateDecode-compressed; when `encrypted`, the trailer carries an
    * /Encrypt entry (triggering the whole-file reject); when
    * `brokenXref`, the catalog's xref offset is corrupted.
    */
  def pdfBytes(tag: Int, nPages: Int, flate: Boolean,
      encrypted: Boolean = false, brokenXref: Boolean = false): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    val offsets = mutable.Map.empty[Int, Int]
    w("%PDF-1.4\n%âãÏÓ\n")
    // object numbers: 1 catalog, 2 pages, then per page i: 3+2i page,
    // 4+2i content
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n")
      body
      w("\nendobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj(2) {
      val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    }
    for (i <- 0 until nPages) {
      obj(3 + 2 * i) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Contents ${4 + 2 * i} 0 R >>")
      }
      val content =
        s"BT /F1 12 Tf 72 720 Td (Page $i of pdf $tag:) Tj " +
          s"[(alpha )-250(beta)] TJ (gamma \\($tag\\)) Tj <68657821> Tj ET"
      val cb0 = content.getBytes(latin1)
      val cb = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(cb0); d.finish()
        val bb = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) bb.write(tmp, 0, d.deflate(tmp))
        d.end()
        bb.toByteArray
      } else cb0
      obj(4 + 2 * i) {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"<< /Length ${cb.length}$filter >>\nstream\n")
        out.write(cb)
        w("\nendstream")
      }
    }
    val nObjs = 2 + 2 * nPages
    val xrefAt = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    for (n <- 1 to nObjs) {
      val off = if (n == 1 && brokenXref) offsets(1) + 3 else offsets(n)
      w(f"$off%010d 00000 n \n")
    }
    val enc = if (encrypted) " /Encrypt 9999 0 R" else ""
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R$enc >>\n")
    w(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
