package graft

import org.apache.spark.sql.functions._

import graft.queries.PorterSql

/** Full-Porter pin against the PUBLISHED examples of Porter (1980) —
  * every worked example in the paper's rule tables plus its
  * end-to-end illustrations, evaluated through the generated SQL the
  * gate query runs (the JDK-agreement precedent: an independent
  * published source of truth, not a re-derivation).
  */
class PorterSpec extends SparkSpec {

  // (input, expected FINAL stem after all steps) — the step tables in
  // the paper show intermediate forms; the expectations here chain
  // every later step too (e.g. relational -> relate -> relat by 5a).
  private val paperExamples: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + follow-ups
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2 (chained through 4/5)
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow",
    "inference" -> "infer", "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // the paper's end-to-end examples
    "generalizations" -> "gener", "oscillators" -> "oscil")

  private def stemAll(words: Seq[String]): Map[String, String] = {
    import spark.implicits._
    val base = words.toDF("w")
    val out = PorterSql.chain("w").foldLeft(base) { case (df, (name, sql)) =>
      df.withColumn(name, expr(sql))
    }
    out.select(col("w"), col("stem")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("every published Porter (1980) example stems to its final form") {
    val got = stemAll(paperExamples.map(_._1))
    val bad = paperExamples.filter { case (w, e) => got(w) != e }
    assert(bad.isEmpty, bad.map { case (w, e) =>
      s"$w: expected $e, got ${got(w)}"
    }.mkString("; "))
  }

  test("the dictionary contract: inflectional families share one lexeme") {
    val fams = Seq(
      Seq("run", "runs"),
      Seq("connect", "connects", "connected", "connecting", "connection",
        "connections"),
      Seq("relate", "relational"),
      Seq("argue", "argued", "arguing"))
    val got = stemAll(fams.flatten.distinct)
    fams.foreach { fam =>
      val stems = fam.map(got).distinct
      assert(stems.size == 1, s"family $fam split into lexemes $stems")
    }
    // and a published NON-unification: original Porter leaves 'happili'
    // (the Snowball revision folds it; this pin guards against silently
    // implementing the wrong edition)
    val g2 = stemAll(Seq("happy", "happily"))
    assert(g2("happy") == "happi" && g2("happily") == "happili")
  }
}
