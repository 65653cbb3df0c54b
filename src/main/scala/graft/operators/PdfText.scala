package graft.operators

import scala.collection.mutable

/** PDF text extraction — the single most common document container in
  * real training corpora, and a first-class family in the multimodal
  * router. A from-scratch reader of the honest production subset,
  * written against the public PDF 1.7 spec (ISO 32000-1):
  *
  *   - BOTH cross-reference forms: classic `xref` TABLES (+ `trailer`
  *     dicts, incremental-update `/Prev` chains followed newest-first
  *     so later sections win) and PDF 1.5+ cross-reference STREAMS
  *     (/Type /XRef, /W field widths, /Index subsections, FlateDecode
  *     and the PNG predictors real writers apply), including hybrid
  *     files' /XRefStm pointers — the modern-default layout most
  *     generators emit;
  *   - OBJECT STREAMS (/Type /ObjStm): type-2 xref entries resolve
  *     through their container's (objnum, offset) header;
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
  *   - any stream filter other than none / FlateDecode; DecodeParms
  *     anywhere but an xref stream's predictor; TIFF predictor 2;
  *   - structural damage: bad header, unparseable startxref/xref,
  *     offsets out of bounds, reference cycles, missing /Root//Pages,
  *     inconsistent /W//Index//N//First tables.
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

  sealed private trait XrefEntry
  private final case class InFile(off: Long) extends XrefEntry
  private final case class InStm(stm: Long, idx: Long) extends XrefEntry

  /** Parse `num gen obj << ... >> stream` at a KNOWN offset where
    * /Length must be a direct integer (the xref-stream case — its
    * length cannot itself need the table being built).
    */
  private def parseStreamObjectAt(b: Array[Byte], at: Int): Option[PStream] =
    try {
      val l = new Lexer(b, at)
      l.parseLong(); l.parseLong(); l.expect("obj")
      val d = l.parseValue(0) match {
        case d: PDict => d
        case _ => return None
      }
      l.skipWs()
      if (l.token() != "stream") return None
      if (!l.atEnd && l.peek == '\r') l.pos += 1
      if (l.atEnd || l.peek != '\n') return None
      l.pos += 1
      val len = d.m.get("Length") match {
        case Some(PInt(n)) if n >= 0 => n
        case _ => return None
      }
      if (l.pos.toLong + len > b.length) return None
      Some(PStream(d, java.util.Arrays.copyOfRange(b, l.pos, l.pos + len.toInt)))
    } catch { case _: Bad => None }

  /** Decode an xref stream's data: none/FlateDecode, then the PNG
    * predictors real writers apply (/DecodeParms /Predictor >= 10,
    * row width /Columns, 1 byte per sample for xref streams;
    * /Predictor 1 is identity). Unknown predictors reject.
    */
  private def xrefStreamData(b: Array[Byte], st: PStream): Option[Array[Byte]] =
    try {
      val raw = st.dict.m.get("Filter") match {
        case None | Some(PNull) => st.raw
        case Some(PName("FlateDecode")) => inflate(st.raw)
        case Some(PArr(Vector(PName("FlateDecode")))) => inflate(st.raw)
        case _ => return None
      }
      st.dict.m.get("DecodeParms") match {
        case None => Some(raw)
        case Some(PDict(pm)) =>
          val pred = pm.get("Predictor") match {
            case None => 1L
            case Some(PInt(p)) => p
            case _ => return None
          }
          if (pred == 1L) Some(raw)
          else if (pred >= 10L) {
            val cols = pm.get("Columns") match {
              case Some(PInt(c)) if c > 0 && c <= (1 << 16) => c.toInt
              case None => 1
              case _ => return None
            }
            Some(pngUnfilter(raw, cols, 1).getOrElse(return None))
          } else None // TIFF predictor 2: out of scope
        case Some(_) => None
      }
    } catch { case _: Bad => None }

  /** PNG row unfilter (filter byte per row): Sub/Up/Average/Paeth —
    * the reconstruction the PNG tier also implements, reproduced here
    * for predicted xref streams.
    */
  private def pngUnfilter(raw: Array[Byte], cols: Int,
      bpp: Int): Option[Array[Byte]] = {
    val rowLen = cols
    if ((raw.length % (rowLen + 1)) != 0) return None
    val nRows = raw.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = raw(r * (rowLen + 1)) & 0xff
      var x = 0
      while (x < rowLen) {
        val v = raw(r * (rowLen + 1) + 1 + x) & 0xff
        val a = if (x >= bpp) out(r * rowLen + x - bpp) & 0xff else 0
        val up = if (r > 0) out((r - 1) * rowLen + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp) out((r - 1) * rowLen + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + up
          case 3 => v + (a + up) / 2
          case 4 =>
            val p = a + up - ul
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(r * rowLen + x) = (rec & 0xff).toByte
        x += 1
      }
      r += 1
    }
    Some(out)
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

    // walk the cross-reference chain (newest first; /Prev chains and
    // hybrid /XRefStm pointers; later sections win). Both forms are in
    // scope: classic `xref` TABLES and PDF 1.5+ cross-reference
    // STREAMS (/Type /XRef with /W field widths, optional
    // FlateDecode + PNG predictors).
    val xref = mutable.Map.empty[Long, XrefEntry]
    var rootRef: Obj = PNull
    var hops = 0
    val pending = mutable.Stack[Long](xrefAt)
    while (pending.nonEmpty) {
      if (hops > MaxPrev) return None
      hops += 1
      val at = pending.pop()
      if (at < 0 || at >= b.length) return None
      val l = new Lexer(b, at.toInt)
      val save = l.pos
      val isClassic = try l.token() == "xref" catch { case _: Bad => false }
      val trailer: PDict =
        if (isClassic) {
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
                xref(start + i) = InFile(off)
              }
              i += 1
            }
            t = l.token()
          }
          l.parseValue(0) match {
            case d: PDict => d
            case _ => return None
          }
        } else {
          // cross-reference STREAM: `num gen obj <<...>> stream...`
          l.pos = save
          val st = parseStreamObjectAt(b, at.toInt).getOrElse(return None)
          if (st.dict.m.get("Type") != Some(PName("XRef"))) return None
          val data = xrefStreamData(b, st).getOrElse(return None)
          val w = st.dict.m.get("W") match {
            case Some(PArr(Vector(PInt(a), PInt(bb2), PInt(c))))
              if a >= 0 && a <= 4 && bb2 >= 0 && bb2 <= 8 && c >= 0 && c <= 8 =>
              (a.toInt, bb2.toInt, c.toInt)
            case _ => return None
          }
          val size = st.dict.m.get("Size") match {
            case Some(PInt(n)) if n >= 0 && n <= MaxObjects => n
            case _ => return None
          }
          val index: Seq[(Long, Long)] = st.dict.m.get("Index") match {
            case None => Seq((0L, size))
            case Some(PArr(items)) if items.length % 2 == 0 =>
              items.grouped(2).map {
                case Vector(PInt(s0), PInt(c0)) if s0 >= 0 && c0 >= 0 => (s0, c0)
                case _ => return None
              }.toSeq
            case _ => return None
          }
          val rowLen = w._1 + w._2 + w._3
          if (rowLen <= 0) return None
          var pos = 0
          def field(width: Int, default: Long): Long = {
            if (width == 0) return default
            var v = 0L
            var i = 0
            while (i < width) { v = (v << 8) | (data(pos + i) & 0xffL); i += 1 }
            pos += width
            v
          }
          index.foreach { case (start, count) =>
            if (count > MaxObjects || xref.size > MaxObjects) return None
            var i = 0L
            while (i < count) {
              if (pos + rowLen > data.length) return None
              val typ = field(w._1, 1L) // absent type field defaults to 1
              val f2 = field(w._2, 0L)
              val f3 = field(w._3, 0L)
              val num = start + i
              if (!xref.contains(num)) typ match {
                case 0 => () // free
                case 1 =>
                  if (f2 < 0 || f2 >= b.length) return None
                  xref(num) = InFile(f2)
                case 2 => xref(num) = InStm(f2, f3)
                case _ => return None
              }
              i += 1
            }
          }
          st.dict
        }
      if (trailer.m.contains("Encrypt")) return None // encrypted: reject
      if (rootRef == PNull) rootRef = trailer.m.getOrElse("Root", PNull)
      trailer.m.get("Prev") match {
        case Some(PInt(p)) => pending.push(p)
        case Some(_) => return None
        case None => ()
      }
      // hybrid-reference files: the classic trailer points at an
      // ADDITIONAL xref stream holding the in-objstm entries
      trailer.m.get("XRefStm") match {
        case Some(PInt(p)) => pending.push(p)
        case Some(_) => return None
        case None => ()
      }
    }
    if (rootRef == PNull) return None

    // indirect-object resolution with memo + cycle guard; type-2
    // entries resolve through their container OBJECT STREAM
    // (/Type /ObjStm: N (objnum, offset) header pairs, values at
    // /First + offset — streams cannot nest inside one, so every
    // member is a plain value)
    val cache = mutable.Map.empty[Long, Obj]
    val inFlight = mutable.Set.empty[Long]
    val objStmCache = mutable.Map.empty[Long, Map[Long, Obj]]
    def objStmMembers(stm: Long): Map[Long, Obj] =
      objStmCache.getOrElseUpdate(stm, {
        val container = xref.get(stm) match {
          case Some(InFile(off)) =>
            parseStreamObjectAt(b, off.toInt).getOrElse(bad())
          case _ => bad() // an objstm cannot itself live in an objstm
        }
        if (container.dict.m.get("Type") != Some(PName("ObjStm"))) bad()
        val n = container.dict.m.get("N") match {
          case Some(PInt(v)) if v >= 0 && v <= MaxObjects => v.toInt
          case _ => bad()
        }
        val first = container.dict.m.get("First") match {
          case Some(PInt(v)) if v >= 0 => v.toInt
          case _ => bad()
        }
        val data = container.dict.m.get("Filter") match {
          case None | Some(PNull) => container.raw
          case Some(PName("FlateDecode")) => inflate(container.raw)
          case Some(PArr(Vector(PName("FlateDecode")))) => inflate(container.raw)
          case _ => bad()
        }
        val hl = new Lexer(data, 0)
        val pairs = (0 until n).map(_ => (hl.parseLong(), hl.parseLong()))
        pairs.map { case (objNum, off) =>
          if (first + off < 0 || first + off >= data.length) bad()
          val vl = new Lexer(data, first + off.toInt)
          objNum -> vl.parseValue(0)
        }.toMap
      })
    def parseInStream(num: Long, stm: Long): Obj =
      objStmMembers(stm).getOrElse(num, bad())
    def parseIndirect(num: Long): Obj = xref.getOrElse(num, bad()) match {
      case InStm(stm, _) => parseInStream(num, stm)
      case InFile(off) => parseInFile(num, off)
    }
    def parseInFile(num: Long, off: Long): Obj = {
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

    // decode each page's content stream(s): filter CHAINS apply in
    // array order (the spec's decode order); Flate, LZW (MSB-first,
    // default early change — the shared [[Multimodal.lzwMsbDecodeGrow]]
    // core) and ASCIIHex are in scope, anything else rejects
    def applyFilter(name: String, data: Array[Byte]): Array[Byte] =
      name match {
        case "FlateDecode" | "Fl" => inflate(data)
        case "LZWDecode" | "LZW" =>
          Multimodal.lzwMsbDecodeGrow(data, 0, data.length, 64 << 20)
            .getOrElse(bad())
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case _ => bad() // unsupported filter: reject, never misread
      }
    def streamBytes(st: PStream): Array[Byte] = {
      if (st.dict.m.contains("DecodeParms") || st.dict.m.contains("DP")) bad()
      resolve(st.dict.m.getOrElse("Filter", PNull), 0) match {
        case PNull => st.raw
        case PName(n) => applyFilter(n, st.raw)
        case PArr(items) =>
          items.foldLeft(st.raw) {
            case (data, PName(n)) => applyFilter(n, data)
            case _ => bad()
          }
        case _ => bad()
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

  /** ASCIIHexDecode: hex pairs, whitespace ignored, '>' terminates
    * (an odd final digit pads with 0 per spec).
    */
  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) bad()
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (!done) bad() // the EOD marker is required
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
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
      encrypted: Boolean = false, brokenXref: Boolean = false,
      xrefStream: Boolean = false, predictor: Boolean = false,
      lzw: Boolean = false, ahx: Boolean = false): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    val offsets = mutable.Map.empty[Int, Int]
    w("%PDF-1.4\n%âãÏÓ\n")
    // object numbers: 1 catalog, 2 pages, then per page i: 3+2i page,
    // 4+2i content. In the xrefStream layout the catalog/pages/page
    // dicts live in an OBJECT STREAM (object nObjs+1) and the
    // cross-reference is itself a stream (object nObjs+2) — the
    // modern-default file shape.
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n")
      body
      w("\nendobj\n")
    }
    def deflate(cb0: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(cb0); d.finish()
      val bb = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) bb.write(tmp, 0, d.deflate(tmp))
      d.end()
      bb.toByteArray
    }
    val catalogBody = "<< /Type /Catalog /Pages 2 0 R >>"
    val pagesBody = {
      val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>"
    }
    def pageBody(i: Int): String =
      s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${4 + 2 * i} 0 R >>"
    if (!xrefStream) {
      obj(1) { w(catalogBody) }
      obj(2) { w(pagesBody) }
    }
    for (i <- 0 until nPages) {
      if (!xrefStream) obj(3 + 2 * i) { w(pageBody(i)) }
      val content =
        s"BT /F1 12 Tf 72 720 Td (Page $i of pdf $tag:) Tj " +
          s"[(alpha )-250(beta)] TJ (gamma \\($tag\\)) Tj <68657821> Tj ET"
      val cb0 = content.getBytes(latin1)
      // content filter ladder: LZW (via the TIFF encoder) or Flate,
      // optionally wrapped in ASCIIHex — /Filter lists in DECODE order
      var cb = cb0
      var names = Vector.empty[String]
      if (lzw) { cb = Multimodal.tiffLzwEncode(cb); names :+= "/LZWDecode" }
      else if (flate) { cb = deflate(cb); names :+= "/FlateDecode" }
      if (ahx) {
        cb = (cb.map("%02x".format(_)).mkString + ">").getBytes(latin1)
        names = "/ASCIIHexDecode" +: names
      }
      obj(4 + 2 * i) {
        val filter = names.length match {
          case 0 => ""
          case 1 => s" /Filter ${names.head}"
          case _ => s" /Filter [ ${names.mkString(" ")} ]"
        }
        w(s"<< /Length ${cb.length}$filter >>\nstream\n")
        out.write(cb)
        w("\nendstream")
      }
    }
    val nObjs = 2 + 2 * nPages
    if (!xrefStream) {
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
    } else {
      // ---- object stream holding catalog + pages + page dicts
      val stmObjNum = nObjs + 1
      val xrefObjNum = nObjs + 2
      val members: Seq[(Int, String)] =
        Seq(1 -> catalogBody, 2 -> pagesBody) ++
          (0 until nPages).map(i => (3 + 2 * i) -> pageBody(i))
      val bodies = new java.io.ByteArrayOutputStream()
      val pairs = new StringBuilder
      members.foreach { case (num, body) =>
        pairs.append(s"$num ${bodies.size()} ")
        bodies.write(body.getBytes(latin1))
        bodies.write(' ')
      }
      val header = pairs.toString.getBytes(latin1)
      val stmData = header ++ bodies.toByteArray
      val stmComp = if (flate) deflate(stmData) else stmData
      obj(stmObjNum) {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"<< /Type /ObjStm /N ${members.size} /First ${header.length}" +
          s"$filter /Length ${stmComp.length} >>\nstream\n")
        out.write(stmComp)
        w("\nendstream")
      }
      // ---- cross-reference stream: W = [1 2 2]
      val xrefAt = out.size()
      offsets(xrefObjNum) = xrefAt
      def row(t: Int, f2: Int, f3: Int): Array[Byte] =
        Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
          ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
      val rows = new java.io.ByteArrayOutputStream()
      rows.write(row(0, 0, 0)) // object 0: free
      var num = 1
      val memberIdx = members.zipWithIndex.map { case ((n2, _), i2) => n2 -> i2 }.toMap
      while (num <= nObjs) {
        if (memberIdx.contains(num)) rows.write(row(2, stmObjNum, memberIdx(num)))
        else rows.write(row(1, offsets(num), 0))
        num += 1
      }
      rows.write(row(1, offsets(stmObjNum), 0))
      rows.write(row(1, xrefAt, 0))
      val rawRows = rows.toByteArray
      val (finalData, parms) =
        if (predictor) {
          // PNG UP filter rows (predictor 12), then Flate — the layout
          // real writers emit
          val cols = 5
          val n = rawRows.length / cols
          val filtered = new java.io.ByteArrayOutputStream()
          var r = 0
          while (r < n) {
            filtered.write(2) // Up
            var x = 0
            while (x < cols) {
              val cur = rawRows(r * cols + x) & 0xff
              val up = if (r > 0) rawRows((r - 1) * cols + x) & 0xff else 0
              filtered.write((cur - up) & 0xff)
              x += 1
            }
            r += 1
          }
          (deflate(filtered.toByteArray),
            " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >>")
        } else if (flate) (deflate(rawRows), " /Filter /FlateDecode")
        else (rawRows, "")
      val enc = if (encrypted) " /Encrypt 9999 0 R" else ""
      w(s"$xrefObjNum 0 obj\n<< /Type /XRef /Size ${xrefObjNum + 1} " +
        s"/W [1 2 2] /Root 1 0 R$enc$parms /Length ${finalData.length} " +
        s">>\nstream\n")
      out.write(finalData)
      w("\nendstream\nendobj\n")
      w(s"startxref\n$xrefAt\n%%EOF\n")
    }
    out.toByteArray
  }
}
