package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TsQuery
import graft.operators.TsQuery._

/** The tsquery grammar's parse table: PG precedence, every operator,
  * and the reject boundaries (malformed input and out-of-scope
  * constructs parse to None, never a guessed tree).
  */
class TsQuerySpec extends AnyFunSuite {

  test("precedence: ! over <-> over & over |") {
    assert(TsQuery.parse("a | b & c")
      .contains(Or(Term("a"), And(Term("b"), Term("c")))))
    assert(TsQuery.parse("a & b <-> c")
      .contains(And(Term("a"), Dist(Term("b"), 1, Term("c")))))
    assert(TsQuery.parse("!a & b")
      .contains(And(Not(Term("a")), Term("b"))))
    assert(TsQuery.parse("a | b <-> c & d")
      .contains(Or(Term("a"), And(Dist(Term("b"), 1, Term("c")), Term("d")))))
  }

  test("parentheses override precedence; nesting unbounded") {
    assert(TsQuery.parse("(a | b) & c")
      .contains(And(Or(Term("a"), Term("b")), Term("c"))))
    assert(TsQuery.parse("((a | b) & (c | d)) & !e")
      .contains(And(And(Or(Term("a"), Term("b")), Or(Term("c"), Term("d"))),
        Not(Term("e")))))
  }

  test("distance forms: <-> is <1>, <N> parses, chains left-associate") {
    assert(TsQuery.parse("a <-> b") == TsQuery.parse("a <1> b"))
    assert(TsQuery.parse("a <2> b")
      .contains(Dist(Term("a"), 2, Term("b"))))
    assert(TsQuery.parse("a <-> b <-> c")
      .contains(Dist(Dist(Term("a"), 1, Term("b")), 1, Term("c"))))
  }

  test("prefix and quoted phrase") {
    assert(TsQuery.parse("sca:*").contains(Prefix("sca")))
    assert(TsQuery.parse("'hash join'")
      .contains(Dist(Term("hash"), 1, Term("join"))))
    assert(TsQuery.parse("'one two three'")
      .contains(Dist(Dist(Term("one"), 1, Term("two")), 1, Term("three"))))
    assert(TsQuery.parse("'solo'").contains(Term("solo")))
    // prefixes are positional: usable inside a distance chain
    assert(TsQuery.parse("sca:* <-> b")
      .contains(Dist(Prefix("sca"), 1, Term("b"))))
  }

  test("double negation and whitespace insensitivity") {
    assert(TsQuery.parse("!!a").contains(Not(Not(Term("a")))))
    assert(TsQuery.parse("  a  &b ") == TsQuery.parse("a & b"))
  }

  test("malformed queries reject: no guessed trees") {
    for (bad <- Seq("", "a &", "& a", "a |", "(a", "a)", "a b", "a <> b",
        "a < b", "a <x> b", "'unterminated", "''", "a!b", "A & b",
        "a-b", "!(", "a & ()"))
      assert(TsQuery.parse(bad).isEmpty, s"accepted: $bad")
  }

  test("out-of-scope distance operands reject (documented subset)") {
    assert(TsQuery.parse("(a | b) <-> c").isEmpty)
    assert(TsQuery.parse("!a <-> b").isEmpty)
    assert(TsQuery.parse("a <-> (b & c)").isEmpty)
  }

  test("websearch dialect: implicit AND, quoted phrases, OR groups, -negation") {
    assert(TsQuery.parseWebsearch("dup vector")
      .contains(And(Term("dup"), Term("vector"))))
    assert(TsQuery.parseWebsearch("dup OR \"merge sort\"")
      .contains(Or(Term("dup"), Dist(Term("merge"), 1, Term("sort")))))
    assert(TsQuery.parseWebsearch("scan -filter")
      .contains(And(Term("scan"), Not(Term("filter")))))
    // OR separates AND groups (a b or c d -> (a&b)|(c&d))
    assert(TsQuery.parseWebsearch("data table or dup vector")
      .contains(Or(And(Term("data"), Term("table")),
        And(Term("dup"), Term("vector")))))
    // -"phrase" negates the whole chain; case folds like PG's dictionary
    assert(TsQuery.parseWebsearch("x -\"merge sort\"")
      .contains(And(Term("x"), Not(Dist(Term("merge"), 1, Term("sort"))))))
    assert(TsQuery.parseWebsearch("DUP Vector")
      .contains(And(Term("dup"), Term("vector"))))
    // rejects: empty, dangling or/-, unterminated phrase, empty phrase
    for (bad <- Seq("", "or", "a or", "or a", "a or or b", "-", "a -",
        "\"unterminated", "\"\"", "a & b"))
      assert(TsQuery.parseWebsearch(bad).isEmpty, s"accepted: $bad")
  }

  test("vocabulary walk collects exact terms and prefixes") {
    val Some(ast) = TsQuery.parse("(a | sca:*) & !b & c <2> d"): @unchecked
    val (terms, prefixes) = TsQuery.vocabulary(ast)
    assert(terms == Set("a", "b", "c", "d"))
    assert(prefixes == Set("sca"))
  }
}
