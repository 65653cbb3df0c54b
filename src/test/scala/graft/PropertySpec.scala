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

  test("as-of join agrees with the brute-force per-row maximum on generated data") {
    import graft.operators.AsOf
    val tsGen: Gen[List[(Int, Int, Int)]] = // (key, time, payload)
      Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50), Gen.choose(0, 999)))
    (0 until 6).foreach { i =>
      val lrows = tsGen(Gen.Parameters.default.withSize(25), Seed(500 + i)).getOrElse(Nil)
      val rrows = tsGen(Gen.Parameters.default.withSize(25), Seed(600 + i)).getOrElse(Nil)
      import spark.implicits._
      val left = lrows.zipWithIndex.map { case ((k, t, _), id) => (id.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rrows.map { case (k, t, p) => (k, t, p) }.toDF("k", "t", "p")
      val got = AsOf.join(left, right,
          col("k"), col("k"), col("t"), col("t"), col("p"), "asof_p")
        .select(col("lid"), col("asof_p"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toInt)).toMap
      // brute-force reference: greatest payload among right rows at the
      // max eligible time (matches AsOf's documented tie resolution)
      val expected = lrows.zipWithIndex.map { case ((k, t, _), id) =>
        val elig = rrows.filter(r => r._1 == k && r._2 <= t)
        val best = if (elig.isEmpty) None else {
          val tmax = elig.map(_._2).max
          Some(elig.filter(_._2 == tmax).map(_._3).max)
        }
        id.toLong -> best
      }.toMap
      assert(got == expected, s"seed ${500 + i}")
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

  test("KMV merge law: sketch of a union = k-min of the merged sketches") {
    // the mergeability claim ns_sketch_kmv_overlap's scale story rests
    // on: KMV_k(A ∪ B) is exactly the k smallest of KMV_k(A) ∪ KMV_k(B)
    // — so per-source/shard sketches combine without touching raw data
    val k = 16
    (0 until 5).foreach { i =>
      val vals = (0 until 10).flatMap { j =>
        rowsGen(Gen.Parameters.default.withSize(60), Seed(900L + i * 10 + j))
          .getOrElse(Nil)
      }.map { case (a, b) => a.toLong * 1000 + b }
      val (xa, xb) = vals.zipWithIndex.partition(_._2 % 2 == 0)
      def hashes(xs: Seq[Long]): Set[Long] = {
        import spark.implicits._
        xs.toDF("x")
          .select(expr(
            "cast(conv(substring(md5(cast(x as string)), 1, 8), 16, 10) as bigint)")
            .as("h"))
          .distinct().collect().map(_.getLong(0)).toSet
      }
      val ha = hashes(xa.map(_._1))
      val hb = hashes(xb.map(_._1))
      def kmv(s: Set[Long]): Set[Long] = s.toSeq.sorted.take(k).toSet
      val direct = kmv(ha ++ hb)
      val merged = kmv(kmv(ha) ++ kmv(hb))
      assert(direct == merged,
        s"KMV merge law broken on sample $i: direct=$direct merged=$merged")
    }
  }

  test("two-pass prefix sum (sequence packing) equals the sequential scan") {
    // arbitrary corpora with RANDOM doc_id gaps: the range-block
    // decomposition (block = floor(id*16/hi)) produces uneven, possibly
    // empty blocks — the offsets must still equal a plain sequential
    // cumsum for ANY id distribution, not just dense ones
    import spark.implicits._
    val corpusGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 97), Gen.choose(1, 50)))
    (0 until 5).foreach { i =>
      val spec = corpusGen(Gen.Parameters.default.withSize(40), Seed(900L + i)).getOrElse(Nil)
      val docs = spec.scanLeft((0L, 0)) { case ((id, _), (gap, n)) => (id + gap, n) }
        .drop(1)
      val tmp = java.nio.file.Files.createTempDirectory(s"pack-prop-$i").toString
      docs.map { case (id, n) =>
        (id, Seq.fill(n)("w").mkString(" "), "en", "gen", n.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = SparkEntry.queries("ns_text_pack")(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expected = docs.sortBy(_._1)
        .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n.toLong, cum + n) }
        .drop(1)
        .map { case (id, n, cum) => (id, n, cum - n) }
      assert(got.toSeq == expected, s"seed ${900 + i}")
    }
  }

  test("mgFold resumability: carried-state fold == one continuous MG pass " +
      "at any split point, and the superset guarantee holds") {
    // the streaming heavy-hitter monitor's load-bearing property: seeding
    // mgFold with a prior segment's counters must equal folding the
    // concatenated stream in one pass (so micro-batch cuts are invisible),
    // and the summary must contain every item heavier than n/(k+1)
    import graft.operators.HeavyHitters
    val tokGen = Gen.listOf(Gen.choose(0, 12).map(i => s"t$i"))
    (0 until 20).foreach { i =>
      val stream = tokGen(Gen.Parameters.default.withSize(200), Seed(7000 + i))
        .getOrElse(Nil)
      val k = 4 + i % 5
      val whole = HeavyHitters.mgFold(k, Map.empty, stream.iterator)
      Seq(0, 1, stream.size / 3, stream.size / 2, stream.size).foreach { cut =>
        val (a, b) = stream.splitAt(cut)
        val carried = HeavyHitters.mgFold(
          k, HeavyHitters.mgFold(k, Map.empty, a.iterator), b.iterator)
        assert(carried == whole, s"seed ${7000 + i} cut $cut k $k")
      }
      val n = stream.size
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      exact.foreach { case (t, c) =>
        if (c.toLong * (k + 1) > n)
          assert(whole.contains(t),
            s"seed ${7000 + i}: heavy item $t (count $c, n $n, k $k) missing")
      }
    }
  }
}
