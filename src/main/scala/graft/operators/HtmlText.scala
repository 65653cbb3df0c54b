package graft.operators

import scala.collection.mutable.ArrayBuffer

/** HTML -> visible-text extraction — the step after WARC HTTP
  * extraction where a crawl response body becomes a corpus document.
  * (Reference analog: the dispatch frame hands raw payloads to every
  * handler, `/root/reference/src/processor.ts:69`; what a text handler
  * does with an HTML payload is exactly this.)
  *
  * A single-pass character state machine, not a regex stack — the
  * traps that break regex strippers are the contract here:
  *
  *   - `<script>`/`<style>` are RAW-TEXT elements: their content is
  *     dropped verbatim up to the matching case-insensitive close tag,
  *     so `document.write("<p>fake</p>")` contributes nothing;
  *   - comments `<!-- ... -->` drop likewise (tags inside comments are
  *     not tags);
  *   - attribute values are quote-scanned, so `href="/r?a>b"` does not
  *     close the tag at the embedded `>`;
  *   - character references decode: the five named predefined entities
  *     plus `&nbsp;` (folded to a plain space so whitespace collapse
  *     stays deterministic) and numeric `&#NN;`/`&#xHH;` forms; an
  *     UNKNOWN named entity passes through verbatim (the lenient
  *     behavior real extractors ship — crawl text is full of bare `&`);
  *   - visible text is the sequence of nonempty whitespace-collapsed
  *     text nodes joined by single spaces — markup layout (newlines and
  *     indentation between elements) cannot change the output;
  *   - `<title>` content is captured separately and EXCLUDED from the
  *     body text (head metadata is not document prose).
  *
  * Reject-never-mis-extract: a structurally truncated document — EOF
  * inside a tag, a comment, a raw-text element, or the title — returns
  * None rather than a partial extraction, and a numeric character
  * reference beyond U+10FFFF is malformed, not content. (Unclosed
  * BODY-level elements are fine — real HTML omits close tags; only
  * constructs whose CONTENT BOUNDARY is lost reject.)
  *
  * Scale: pure per-row computation — callers run it inside one narrow
  * `mapPartitions` pass over document text; extracted stats (a handful
  * of longs + the title) leave the map side, bodies never shuffle.
  */
object HtmlText {

  /** Extraction result: page title (collapsed, trimmed), number of
    * `<a>` tags carrying an href attribute, number of `<p>` elements
    * opened, the visible body text (entity-decoded, whitespace
    * collapsed), and the href VALUES in document order (entity-decoded
    * — `&amp;` in a URL is one `&`; quotes stripped) for link-graph
    * consumers.
    */
  final case class Extract(title: String, nLinks: Long, nPara: Long,
      text: String, hrefs: Vector[String] = Vector.empty)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Deterministic fixture page: every extractor trap in one document
    * (script printing fake `<p>` tags, style + comment markup, quoted
    * `>` in attributes, named + numeric entities, uppercase tags,
    * layout whitespace). The EXPECTED extraction has a closed form the
    * oracles replay: title `Crawl & Page <seed>`, nPara paragraphs
    * `Section <i> of page <seed>: alpha & beta <tag> A=A B=B.`, nLink
    * anchors `link <j> of page <seed>`, then
    * `trailing words of page <seed>`, joined by single spaces.
    */
  def htmlPage(seed: Int, nPara: Int, nLink: Int): String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<HTML>\n<head>\n")
    sb.append(s"<TITLE>Crawl  &amp;\n Page $seed</TITLE>\n")
    sb.append("<style type=\"text/css\">p{color:#fff} /* <p>not text</p> */</style>\n")
    sb.append("<script>if (1 < 2) { document.write(\"<p>fake " +
      seed + "</p>\"); }</script>\n")
    sb.append("</head>\n<BODY>\n<!-- <p>ghost</p> -->\n")
    for (i <- 0 until nPara)
      sb.append(s"""<p class="t$i">Section $i of page $seed: alpha &amp; beta""" +
        " &lt;tag&gt; A=&#65; B=&#x42;.</p>\n")
    for (j <- 0 until nLink)
      sb.append(s"""<a href="/r?a>b&amp;x=$j" TITLE="x>y">link $j of page $seed</a>\n""")
    sb.append(s"<br/>\ntrailing words of page $seed\n</BODY></HTML>\n")
    sb.toString
  }

  /** Decode character references in a raw text node. Returns None on a
    * malformed numeric reference (out of Unicode range).
    */
  private[operators] def decodeEntities(s: String): Option[String] = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // A reference needs a ';' within a short window; otherwise the
        // '&' is literal text (lenient mode).
        if (semi < 0 || semi - i > 32) { out.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] = body match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case b if b.startsWith("#x") || b.startsWith("#X") =>
              try {
                val cp = java.lang.Long.parseLong(b.substring(2), 16)
                if (cp < 0L || cp > 0x10FFFFL) return None
                Some(new String(Character.toChars(cp.toInt)))
              } catch { case _: NumberFormatException => Some(null) }
            case b if b.startsWith("#") =>
              try {
                val cp = java.lang.Long.parseLong(b.substring(1), 10)
                if (cp < 0L || cp > 0x10FFFFL) return None
                Some(new String(Character.toChars(cp.toInt)))
              } catch { case _: NumberFormatException => Some(null) }
            case _ => Some(null) // unknown named entity -> verbatim
          }
          decoded match {
            case None => return None
            case Some(null) => out.append('&'); i += 1
            case Some(d) => out.append(d); i = semi + 1
          }
        }
      }
    }
    Some(out.toString)
  }

  /** Collapse whitespace runs to single spaces and trim. */
  private[operators] def collapse(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Parse an HTML document and extract title / link count / paragraph
    * count / visible text. None on structural truncation or a
    * malformed numeric character reference (see object doc).
    */
  def extract(html: String): Option[Extract] = {
    val n = html.length
    var i = 0
    var nLinks = 0L
    var nPara = 0L
    var title: String = ""
    var sawTitle = false
    val fragments = ArrayBuffer.empty[String]
    val hrefs = ArrayBuffer.empty[String]
    val textBuf = new java.lang.StringBuilder

    def flushText(): Boolean = {
      if (textBuf.length > 0) {
        val raw = textBuf.toString
        textBuf.setLength(0)
        decodeEntities(raw) match {
          case None => return false
          case Some(d) =>
            val c = collapse(d)
            if (c.nonEmpty) fragments += c
        }
      }
      true
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { textBuf.append(c); i += 1 }
      else if (!flushText()) return None // every markup construct bounds a text node
      else if (html.startsWith("<!--", i)) {
        val end = html.indexOf("-->", i + 4)
        if (end < 0) return None // unterminated comment
        i = end + 3
      } else {
        // Scan the tag: name, then attributes honoring quotes.
        var j = i + 1
        val close = j < n && html.charAt(j) == '/'
        if (close) j += 1
        val nameStart = j
        while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '!' ||
            html.charAt(j) == '?')) j += 1
        val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        // attribute scan to the closing '>': a real attribute-level
        // parse (name [= value], quoted or bare values, quote-aware),
        // NOT a regex over the raw attribute text — ' href=' inside
        // another attribute's quoted value must not steal the
        // extraction (<a title="x href=evil" href="/real"> yields
        // /real, never evil)
        var sawHref = false      // an actual href= attribute was parsed
        var hrefVal: String = null // its value; null when bare-empty
        var done = false
        while (j < n && !done) {
          val a = html.charAt(j)
          if (a == '>') { done = true }
          else if (isWs(a) || a == '/') j += 1
          else {
            val ns = j
            while (j < n && {
              val c2 = html.charAt(j)
              c2 != '=' && c2 != '>' && c2 != '/' && !isWs(c2)
            }) j += 1
            val aname = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
            var k = j
            while (k < n && isWs(html.charAt(k))) k += 1
            var hadEq = false
            var value: String = null
            if (k < n && html.charAt(k) == '=') {
              hadEq = true
              k += 1
              while (k < n && isWs(html.charAt(k))) k += 1
              if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                val q = html.charAt(k)
                k += 1
                val vs = k
                while (k < n && html.charAt(k) != q) k += 1
                if (k >= n) { j = n } // unterminated quote: EOF inside tag
                else {
                  value = html.substring(vs, k)
                  j = k + 1
                }
              } else {
                val vs = k
                while (k < n && !isWs(html.charAt(k)) && html.charAt(k) != '>') k += 1
                if (k > vs) value = html.substring(vs, k)
                j = k
              }
            }
            if (aname == "href" && hadEq && !sawHref) {
              sawHref = true
              hrefVal = value
            }
          }
        }
        if (!done) return None // EOF inside a tag
        if (!close) {
          if (name == "a" && sawHref) {
            nLinks += 1
            if (hrefVal != null) {
              decodeEntities(hrefVal) match {
                case None => return None // malformed reference in the URL
                case Some(d) => hrefs += d
              }
            }
          }
          if (name == "p") nPara += 1
        }
        i = j + 1
        if (!close && (name == "script" || name == "style")) {
          // raw text: skip to the matching case-insensitive close tag
          val closeTag = "</" + name
          var k = i
          var found = -1
          while (found < 0 && k + closeTag.length <= n) {
            if (html.regionMatches(true, k, closeTag, 0, closeTag.length))
              found = k
            else k += 1
          }
          if (found < 0) return None // unterminated raw-text element
          val gt = html.indexOf('>', found)
          if (gt < 0) return None
          i = gt + 1
        } else if (!close && name == "title" && !sawTitle) {
          val closeTag = "</title"
          var k = i
          var found = -1
          while (found < 0 && k + closeTag.length <= n) {
            if (html.regionMatches(true, k, closeTag, 0, closeTag.length))
              found = k
            else k += 1
          }
          if (found < 0) return None // unterminated title
          decodeEntities(html.substring(i, found)) match {
            case None => return None
            case Some(d) => title = collapse(d); sawTitle = true
          }
          val gt = html.indexOf('>', found)
          if (gt < 0) return None
          i = gt + 1
        } // any other tag: text was already flushed at the '<'
      }
    }
    if (!flushText()) return None
    Some(Extract(title, nLinks, nPara, fragments.mkString(" "), hrefs.toVector))
  }
}
