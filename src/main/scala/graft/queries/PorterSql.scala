package graft.queries

/** The FULL Porter stemmer (Porter 1980, "An algorithm for suffix
  * stripping" — the original published rule set, which is what PG's
  * `english` Snowball config descends from) as GENERATED
  * dialect-neutral SQL: every step is a CASE/substring/LIKE/length
  * expression evaluated VERBATIM by both Spark (`expr`) and DuckDB —
  * the cross-engine contract of the FTS dictionary layer is that both
  * engines compute the identical function, so the oracle replays the
  * same SQL rather than trusting a second implementation.
  *
  * Mechanics:
  *  - the m-measure ([C](VC)^m[V]) never needs counting, only the
  *    m>0 / m>1 / m=1 gates — computed on a per-word CV SKELETON
  *    column ('v'/'c' per letter, unrolled to [[MaxLen]] chars) with
  *    `LIKE '%v%c%'` (m>=1) and `LIKE '%v%c%v%c%'` (m>=2). Removing a
  *    suffix only truncates the skeleton, so every rule's stem
  *    condition is a skeleton PREFIX test; suffix REPLACEMENTS change
  *    trailing classes, so the skeleton recomputes between steps.
  *  - y is a vowel iff preceded by a consonant; the skeleton uses the
  *    preceding letter's base class (aeiou), which equals the full
  *    recursive definition except for 'yy' runs after a consonant —
  *    absent from English and from the published example vocabulary.
  *  - *o (stem ends cvc, last not w/x/y) and *d (final double
  *    consonant) read skeleton + word positions directly.
  *  - every substring start/length is clamped with `greatest` because
  *    vectorized engines may evaluate both AND operands — a negative
  *    length in a false branch must not throw.
  *  - steps 2-4 order their rules longest-suffix-first and use
  *    NESTED conditions (a matched suffix whose m-gate fails STOPS
  *    the step — Porter's longest-match-then-test-once semantics,
  *    the corner that distinguishes `rational -> ration` from a
  *    naive fall-through).
  *
  * The original 1980 rule table is used verbatim (no later Snowball
  * revisions such as `logi -> log`); PorterSpec pins the published
  * paper examples end-to-end.
  */
private[graft] object PorterSql {

  val MaxLen = 30
  private val V = "('a','e','i','o','u')"

  /** CV skeleton of column c, one class char per letter. */
  def skeletonSql(c: String): String =
    (1 to MaxLen).map { i =>
      val ch = s"substring($c, $i, 1)"
      val inner =
        if (i == 1) s"CASE WHEN $ch IN $V THEN 'v' ELSE 'c' END"
        else {
          val prev = s"substring($c, ${i - 1}, 1)"
          s"CASE WHEN $ch IN $V THEN 'v' " +
            s"WHEN $ch = 'y' AND $prev NOT IN $V THEN 'v' ELSE 'c' END"
        }
      s"CASE WHEN length($c) >= $i THEN $inner ELSE '' END"
    }.mkString("(", " || ", ")")

  private def chop(w: String, d: Int): String =
    s"substring($w, 1, greatest(0, length($w) - $d))"
  private def stemK(k: String, w: String, d: Int): String =
    s"substring($k, 1, greatest(0, length($w) - $d))"
  private def m1(k: String, w: String, d: Int): String =
    s"${stemK(k, w, d)} LIKE '%v%c%'"
  private def m2(k: String, w: String, d: Int): String =
    s"${stemK(k, w, d)} LIKE '%v%c%v%c%'"
  private def hasV(k: String, w: String, d: Int): String =
    s"${stemK(k, w, d)} LIKE '%v%'"
  private def starO(k: String, w: String, d: Int): String =
    s"(length($w) - $d >= 3 AND " +
      s"substring($k, greatest(1, length($w) - $d - 2), 3) = 'cvc' AND " +
      s"substring($w, greatest(1, length($w) - $d), 1) NOT IN ('w','x','y'))"
  private def starD(k: String, w: String, d: Int): String =
    s"(length($w) - $d >= 2 AND " +
      s"substring($k, greatest(1, length($w) - $d), 1) = 'c' AND " +
      s"substring($w, greatest(1, length($w) - $d - 1), 1) = " +
      s"substring($w, greatest(1, length($w) - $d), 1))"

  /** Step 1a: SSES->SS, IES->I, SS->SS, S->. */
  def step1a(w: String): String =
    s"""CASE WHEN $w LIKE '%sses' THEN ${chop(w, 2)}
       |  WHEN $w LIKE '%ies' THEN ${chop(w, 2)}
       |  WHEN $w LIKE '%ss' THEN $w
       |  WHEN $w LIKE '%s' AND length($w) > 1 THEN ${chop(w, 1)}
       |  ELSE $w END""".stripMargin

  /** Step 1b: (m>0) EED->EE | (*v*) ED-> | (*v*) ING-> with the
    * at/bl/iz +e, *d-undouble (not l/s/z), (m=1 & *o) +e follow-ups.
    */
  def step1b(w: String, k: String): String = {
    def follow(d: Int): String = {
      val t = chop(w, d)
      s"""CASE WHEN $t LIKE '%at' OR $t LIKE '%bl' OR $t LIKE '%iz'
         |    THEN $t || 'e'
         |  WHEN ${starD(k, w, d)} AND
         |      substring($w, greatest(1, length($w) - $d), 1)
         |        NOT IN ('l','s','z')
         |    THEN ${chop(w, d + 1)}
         |  WHEN ${m1(k, w, d)} AND NOT ${m2(k, w, d)} AND ${starO(k, w, d)}
         |    THEN $t || 'e'
         |  ELSE $t END""".stripMargin
    }
    s"""CASE WHEN $w LIKE '%eed' THEN
       |    CASE WHEN ${m1(k, w, 3)} THEN ${chop(w, 1)} ELSE $w END
       |  WHEN $w LIKE '%ed' AND ${hasV(k, w, 2)} THEN ${follow(2)}
       |  WHEN $w LIKE '%ing' AND ${hasV(k, w, 3)} THEN ${follow(3)}
       |  ELSE $w END""".stripMargin
  }

  /** Step 1c: (*v*) Y->I. */
  def step1c(w: String, k: String): String =
    s"""CASE WHEN $w LIKE '%y' AND ${hasV(k, w, 1)}
       |  THEN ${chop(w, 1)} || 'i' ELSE $w END""".stripMargin

  /** Longest-match-then-test-ONCE rule chain (steps 2-4 semantics). */
  private def ruleChain(w: String, rules: Seq[(String, String)],
      cond: Int => String): String = {
    val whens = rules.map { case (suf, rep) =>
      val d = suf.length
      val out = if (rep.isEmpty) chop(w, d) else s"${chop(w, d)} || '$rep'"
      s"WHEN $w LIKE '%$suf' THEN CASE WHEN ${cond(d)} THEN $out ELSE $w END"
    }
    s"CASE ${whens.mkString("\n  ")}\n  ELSE $w END"
  }

  /** Step 2 (m>0), the original 20-rule table, longest suffix first. */
  def step2(w: String, k: String): String =
    ruleChain(w, Seq(
      "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous",
      "tional" -> "tion", "biliti" -> "ble",
      "entli" -> "ent", "ousli" -> "ous", "ation" -> "ate",
      "alism" -> "al", "aliti" -> "al", "iviti" -> "ive",
      "enci" -> "ence", "anci" -> "ance", "izer" -> "ize",
      "abli" -> "able", "alli" -> "al", "ator" -> "ate",
      "eli" -> "e"), d => m1(k, w, d))

  /** Step 3 (m>0). */
  def step3(w: String, k: String): String =
    ruleChain(w, Seq(
      "icate" -> "ic", "iciti" -> "ic", "alize" -> "al", "ative" -> "",
      "ical" -> "ic", "ness" -> "",
      "ful" -> ""), d => m1(k, w, d))

  /** Step 4 (m>1) deletions; ION additionally requires the stem to
    * end s/t.
    */
  def step4(w: String, k: String): String = {
    val plain = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize")
    val whens = plain.map { suf =>
      val d = suf.length
      s"WHEN $w LIKE '%$suf' THEN CASE WHEN ${m2(k, w, d)} " +
        s"THEN ${chop(w, d)} ELSE $w END"
    } :+ {
      s"WHEN $w LIKE '%ion' THEN CASE WHEN ${m2(k, w, 3)} AND " +
        s"substring($w, greatest(1, length($w) - 3), 1) IN ('s','t') " +
        s"THEN ${chop(w, 3)} ELSE $w END"
    } :++ Seq("al", "er", "ic", "ou").map { suf =>
      val d = suf.length
      s"WHEN $w LIKE '%$suf' THEN CASE WHEN ${m2(k, w, d)} " +
        s"THEN ${chop(w, d)} ELSE $w END"
    }
    s"CASE ${whens.mkString("\n  ")}\n  ELSE $w END"
  }

  /** Step 5a: (m>1) E-> ; (m=1 & not *o) E->. */
  def step5a(w: String, k: String): String =
    s"""CASE WHEN $w LIKE '%e' THEN
       |    CASE WHEN ${m2(k, w, 1)} THEN ${chop(w, 1)}
       |      WHEN ${m1(k, w, 1)} AND NOT ${m2(k, w, 1)}
       |        AND NOT ${starO(k, w, 1)} THEN ${chop(w, 1)}
       |      ELSE $w END
       |  ELSE $w END""".stripMargin

  /** Step 5b: (m>1 & *d & *L) -> single l. */
  def step5b(w: String, k: String): String =
    s"""CASE WHEN $w LIKE '%ll' AND $k LIKE '%v%c%v%c%'
       |  THEN ${chop(w, 1)} ELSE $w END""".stripMargin

  /** The full chain as ordered (column name, SQL) pairs: Spark folds
    * them as withColumn, DuckDB as chained `SELECT *, expr AS name`
    * CTEs — the same strings verbatim. The final column is `stem`.
    * Skeletons recompute after every word-changing step (replacement
    * suffixes change trailing classes); step 5a only drops a final e,
    * so its skeleton prefix-derives.
    */
  def chain(wCol: String): Seq[(String, String)] = Seq(
    "pw1" -> step1a(wCol),
    "pk1" -> skeletonSql("pw1"),
    "pw2" -> step1b("pw1", "pk1"),
    "pk2" -> skeletonSql("pw2"),
    "pw3" -> step1c("pw2", "pk2"),
    "pk3" -> skeletonSql("pw3"),
    "pw4" -> step2("pw3", "pk3"),
    "pk4" -> skeletonSql("pw4"),
    "pw5" -> step3("pw4", "pk4"),
    "pk5" -> skeletonSql("pw5"),
    "pw6" -> step4("pw5", "pk5"),
    "pk6" -> skeletonSql("pw6"),
    "pw7" -> step5a("pw6", "pk6"),
    "pk7" -> s"substring(pk6, 1, length(pw7))",
    "stem" -> step5b("pw7", "pk7"))
}
