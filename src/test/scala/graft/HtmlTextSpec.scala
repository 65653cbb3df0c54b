package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HtmlText

/** The HTML visible-text extractor's trap table: every case here is a
  * construct that breaks a regex-based tag stripper, plus the reject
  * boundaries (truncation never yields a partial extraction).
  */
class HtmlTextSpec extends AnyFunSuite {

  private def x(html: String) = HtmlText.extract(html)

  test("script and style bodies are dropped, including fake tags inside") {
    val e = x("<html><script>document.write(\"<p>fake</p>\");</script>" +
      "<style>p{} /* <p>no</p> */</style><p>real text</p></html>").get
    assert(e.text == "real text")
    assert(e.nPara == 1) // the <p>s inside script/style never parse as tags
  }

  test("comments are dropped and bound text nodes") {
    val e = x("alpha<!-- <p>ghost</p> -->beta").get
    assert(e.text == "alpha beta")
    assert(e.nPara == 0)
  }

  test("quoted '>' inside an attribute does not close the tag") {
    val e = x("""<a href="/r?a>b" title='x>y'>anchor</a>""").get
    assert(e.text == "anchor")
    assert(e.nLinks == 1)
  }

  test("anchor without href is not a link") {
    val e = x("""<a name="top">target</a><a href=/x>go</a>""").get
    assert(e.nLinks == 1)
    assert(e.text == "target go")
  }

  test("entities decode: named, decimal, hex; unknown passes verbatim") {
    val e = x("<p>a&amp;b &lt;t&gt; &#65;&#x42; &quot;q&quot; &zzz; &nbsp;x</p>").get
    assert(e.text == "a&b <t> AB \"q\" &zzz; x")
  }

  test("bare ampersand and no-semicolon reference are literal text") {
    val e = x("<p>fish & chips &ampx</p>").get
    assert(e.text == "fish & chips &ampx")
  }

  test("title is captured (collapsed) and excluded from body text") {
    val e = x("<head><TITLE> A  &amp;\n B </TITLE></head><body>body</body>").get
    assert(e.title == "A & B")
    assert(e.text == "body")
  }

  test("uppercase raw-text tags match case-insensitively") {
    val e = x("<SCRIPT>var a = '<P>no</P>';</SCRIPT><p>yes</p>").get
    assert(e.text == "yes")
    assert(e.nPara == 1)
  }

  test("markup-layout whitespace collapses; inline tags join fragments") {
    val e = x("<div>\n  one\n  <b>two</b>\n  three\n</div>").get
    assert(e.text == "one two three")
  }

  test("numeric reference beyond U+10FFFF rejects the document") {
    assert(x("<p>bad &#1114112; ref</p>").isEmpty)
    assert(x("<p>ok &#1114111; ref</p>").nonEmpty) // U+10FFFF itself decodes
  }

  test("structural truncation rejects: tag, comment, raw text, title") {
    assert(x("text <a href=").isEmpty)
    assert(x("text <!-- never closed").isEmpty)
    assert(x("<script>var x = 1;").isEmpty)
    assert(x("<title>no end").isEmpty)
  }

  test("unclosed body-level elements are fine (real HTML omits them)") {
    val e = x("<body><p>one<p>two").get
    assert(e.text == "one two")
    assert(e.nPara == 2)
  }

  test("nbsp folds to a plain space so collapse stays deterministic") {
    val e = x("<p>a&nbsp;&nbsp;b</p>").get
    assert(e.text == "a b")
  }

  test("' href=' inside another attribute's quoted value never steals extraction") {
    val e = x("""<a title="x href=evil" href="/real">link</a>""").get
    assert(e.hrefs == Vector("/real"))
    assert(e.nLinks == 1)
    // an anchor whose only href-looking text sits inside another
    // attribute's quoted value is not a link at all
    val f = x("""<a title="see href=/nope here">plain</a>""").get
    assert(f.nLinks == 0)
    assert(f.hrefs.isEmpty)
  }

  test("href values are captured in order, entity-decoded, all quote forms") {
    val e = x("""<a href="/r?a>b&amp;x=0">one</a>""" +
      "<a HREF='https://Site.example/p'>two</a>" +
      "<a href=/bare/path>three</a>" +
      """<a name="no-href">four</a>""").get
    assert(e.hrefs ==
      Vector("/r?a>b&x=0", "https://Site.example/p", "/bare/path"))
    assert(e.nLinks == 3)
  }
}
