package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants over generated inputs (SURVEY.md §5.2.3):
  * cardinality laws of union/filter/join/set ops and sort idempotence.
  * Uses scalacheck generators with fixed seeds (deterministic runs,
  * no extra scalatest bridge artifact needed offline).
  */
class PropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(-5, 5), Gen.choose(0, 100)))

  /** 10 deterministic samples per law. */
  private def samples(offset: Long): Seq[List[(Int, Int)]] =
    (0 until 10).map { i =>
      rowsGen(Gen.Parameters.default.withSize(30), Seed(offset + i)).getOrElse(Nil)
    }

  private def df(rows: List[(Int, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("unionAll cardinality = sum of cardinalities") {
    samples(1).zip(samples(101)).foreach { case (a, b) =>
      assert(df(a).unionAll(df(b)).count() == a.size + b.size)
    }
  }

  test("filter splits partition the input") {
    samples(2).foreach { a =>
      val d = df(a)
      assert(d.where(col("v") > 50).count() + d.where(!(col("v") > 50)).count() == a.size)
    }
  }

  test("inner join row count equals the key-multiplicity product sum") {
    samples(3).zip(samples(103)).foreach { case (a, b) =>
      val expected = a.groupBy(_._1).map { case (k, as) =>
        as.size.toLong * b.count(_._1 == k)
      }.sum
      val got = df(a).as("l").join(df(b).as("r"), col("l.k") === col("r.k")).count()
      assert(got == expected)
    }
  }

  test("multiset law: |A intersectAll B| + |A exceptAll B| = |A|") {
    samples(4).zip(samples(104)).foreach { case (a, b) =>
      val (da, db) = (df(a), df(b))
      assert(da.intersectAll(db).count() + da.exceptAll(db).count() == a.size)
    }
  }

  test("distinct is idempotent and bounded by input size") {
    samples(5).foreach { a =>
      val d = df(a).distinct()
      assert(d.count() == d.distinct().count())
      assert(d.count() <= a.size)
    }
  }

  test("sort is idempotent: sorting a sorted frame preserves the sequence") {
    samples(6).foreach { a =>
      val once = df(a).orderBy(col("k"), col("v")).collect().toSeq
      val twice = df(a).orderBy(col("k"), col("v"))
        .orderBy(col("k"), col("v")).collect().toSeq
      assert(once == twice)
    }
  }

  test("dropDuplicates on key yields one row per distinct key") {
    samples(7).foreach { a =>
      assert(df(a).dropDuplicates("k").count() == a.map(_._1).distinct.size)
    }
  }

  test("groupBy sum equals per-key scala sum (exact ints)") {
    samples(8).foreach { a =>
      val got = df(a).groupBy(col("k")).agg(sum(col("v")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expected = a.groupBy(_._1).map { case (k, as) => k -> as.map(_._2.toLong).sum }
      assert(got == expected)
    }
  }
}
