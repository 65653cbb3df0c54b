package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** RFC 9309 decision semantics, pinned case by case — group selection,
  * longest-match precedence, the allow tie-break, wildcard/anchor
  * patterns, and the lenient-parse rules.
  */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.json$
      |Allow: /api/*.json$
      |
      |User-agent: *
      |Disallow: /tmp/
      |Allow: /
      |Crawl-delay: 2
      |""".stripMargin

  private val g = Robots.parse(txt)

  test("specific group beats the * group; * group applies otherwise") {
    assert(Robots.decide(g, "graftbot", "/tmp/x") == (true, 0)) // not in its group
    assert(Robots.decide(g, "otherbot", "/tmp/x") == (false, 5))
  }

  test("longest pattern wins; allow wins a length tie") {
    assert(Robots.decide(g, "graftbot", "/private/x") == (false, 9))
    assert(Robots.decide(g, "graftbot", "/private/public/y") == (true, 16))
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /a/b/\nAllow: /a/*/\n")
    // both length 6... /a/b/ is 5, /a/*/ is 5 — equal length, allow wins
    assert(Robots.decide(tie, "any", "/a/b/c") == (true, 5))
  }

  test("* matches runs; trailing $ anchors over path+query") {
    assert(Robots.decide(g, "graftbot", "/data/file.json") == (false, 8))
    assert(Robots.decide(g, "graftbot", "/data/file.json?x=1") == (true, 0))
    assert(Robots.decide(g, "graftbot", "/api/v1/data.json") == (true, 12))
    assert(Robots.decide(g, "graftbot", "/a/b.json.txt") == (true, 0))
  }

  test("$ not at the end is literal") {
    val p = Robots.parse("User-agent: *\nDisallow: /a$b\n")
    assert(Robots.decide(p, "x", "/a$bc") == (false, 4))
    assert(Robots.decide(p, "x", "/ab") == (true, 0))
  }

  test("prefix boundary: /private/ does not match /privatevalue") {
    assert(Robots.decide(g, "graftbot", "/privatevalue") == (true, 0))
  }

  test("agent and key matching are case-insensitive") {
    val p = Robots.parse("USER-AGENT: GraftBot\nDISALLOW: /x\n")
    assert(Robots.decide(p, "graftbot", "/x/y") == (false, 2))
  }

  test("consecutive user-agent lines share one group") {
    val p = Robots.parse("User-agent: a\nUser-agent: b\nDisallow: /q\n")
    assert(Robots.decide(p, "b", "/q") == (false, 2))
    // a rule line ENDS the agent run: a later User-agent starts a NEW group
    val p2 = Robots.parse("User-agent: a\nDisallow: /q\nUser-agent: b\nDisallow: /r\n")
    assert(Robots.decide(p2, "b", "/q") == (true, 0))
    assert(Robots.decide(p2, "b", "/r") == (false, 2))
  }

  test("multiple groups for the same agent merge") {
    val p = Robots.parse(
      "User-agent: a\nDisallow: /one\nUser-agent: a\nDisallow: /two\n")
    assert(Robots.decide(p, "a", "/one") == (false, 4))
    assert(Robots.decide(p, "a", "/two") == (false, 4))
  }

  test("empty Disallow matches nothing; rules before any group drop") {
    val p = Robots.parse("Disallow: /early\nUser-agent: *\nDisallow:\n")
    assert(Robots.decide(p, "x", "/early") == (true, 0))
    assert(Robots.decide(p, "x", "/anything") == (true, 0))
  }

  test("comments strip; unknown directives and malformed lines skip") {
    val p = Robots.parse(
      "User-agent: * # all\nSitemap: http://x/s.xml\nnonsense line\nDisallow: /z # here\n")
    assert(Robots.decide(p, "x", "/z/1") == (false, 2))
  }

  test("no groups at all allows everything") {
    assert(Robots.decide(Vector.empty, "x", "/anything") == (true, 0))
  }
}
