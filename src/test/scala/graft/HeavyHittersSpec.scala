package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.HeavyHitters

/** The Misra-Gries contract behind `ns_sketch_heavy_hitters`
  * (SURVEY.md §2C): (1) a width-k summary undercounts any item by at
  * most n/(k+1); (2) the UNION of per-partition summaries contains
  * every item whose GLOBAL frequency exceeds n/(k+1) — the superset
  * property that makes the sketch-then-exact-recount plan
  * deterministic; (3) the recount pipeline (candidates -> exact counts
  * -> exact threshold) equals the all-exact answer regardless of how
  * the stream was partitioned.
  */
class HeavyHittersSpec extends SparkSpec {

  /** Skewed streams: a few hot tokens over a long uniform tail. */
  private def stream(seed: Long, n: Int): Vector[String] = {
    val g = Gen.frequency(
      (6, Gen.oneOf("hot1", "hot2", "hot3")),
      (4, Gen.choose(0, 499).map(i => s"cold$i")))
    Vector.tabulate(n) { i =>
      g(Gen.Parameters.default, Seed(seed * 100003 + i)).getOrElse("hot1")
    }
  }

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  test("single-partition summary undercounts by at most n/(k+1)") {
    for (seed <- 1L to 5L; k <- Seq(4, 16, 64)) {
      val xs = stream(seed, 3000)
      val mg = HeavyHitters.mgPartition(k)(xs.iterator).toMap
      val slack = xs.size.toLong / (k + 1)
      assert(mg.size <= k)
      exact(xs).foreach { case (t, c) =>
        val est = mg.getOrElse(t, 0L)
        assert(est <= c, s"MG overcounted $t: $est > $c")
        assert(est >= c - slack, s"MG undercounted $t past n/(k+1): $est < $c - $slack")
      }
    }
  }

  test("union of per-partition summaries is a superset of the global heavies") {
    for (seed <- 6L to 10L; parts <- Seq(1, 3, 8)) {
      val xs = stream(seed, 4000)
      val k = 16
      val cand = xs.grouped(math.max(1, xs.size / parts)).toSeq
        .flatMap(p => HeavyHitters.mgPartition(k)(p.iterator).map(_._1)).toSet
      val thr = xs.size.toLong / (k + 1)
      val missed = exact(xs).collect { case (t, c) if c > thr && !cand(t) => t }
      assert(missed.isEmpty, s"heavies missing from candidate union: $missed")
    }
  }

  test("sketch-then-exact-recount equals the all-exact answer for any partitioning") {
    for (seed <- 11L to 13L) {
      val xs = stream(seed, 4000)
      val k = 16
      val n = xs.size.toLong
      val truth = exact(xs).filter { case (_, c) => c * (k + 1) > n }
      for (parts <- Seq(1, 4, 7)) {
        val cand = xs.grouped(math.max(1, xs.size / parts)).toSeq
          .flatMap(p => HeavyHitters.mgPartition(k)(p.iterator).map(_._1)).toSet
        val got = exact(xs.filter(cand))
          .filter { case (_, c) => c * (k + 1) > n }
        assert(got == truth, s"recount diverged at $parts partitions")
      }
    }
  }

  test("the registered query's distributed pass matches a local recount") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.CurationQueries.all("ns_sketch_heavy_hitters")
      .fn(spark, dir)
      .select(col("tok"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .collect().map(_.getString(0)).toSeq
    val n = toks.size.toLong
    val truth = exact(toks).filter { case (_, c) => c * 33 > n }
    assert(out == truth)
  }
}
