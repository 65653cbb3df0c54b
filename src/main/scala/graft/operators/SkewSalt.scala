package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §2 "salting for skew").
  *
  * A `groupBy(hotKey)` funnels every row of a hot key through one
  * reducer. [[saltedAgg]] splits each key into `salts` sub-keys with a
  * DETERMINISTIC salt (hash of stable tiebreak columns mod salts — not
  * `rand()`, which would break retry/replay determinism and the oracle),
  * aggregates partially per (key, salt), then merges the partials in a
  * second, much smaller aggregation. The two-level tree costs one extra
  * tiny shuffle and removes the single-reducer ceiling.
  *
  * Works for any algebraic aggregate (sum/count/min/max); the caller
  * provides both the per-salt partial and the merge expression.
  * Note: Spark's AQE skew-join handles JOIN skew automatically; this
  * helper is for aggregation skew, which AQE does not repartition.
  */
object SkewSalt {

  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      salts: Int,
      partials: Seq[(Column, String)],
      merged: Seq[(String, String => Column)]): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partials.head._1.as(partials.head._2),
           partials.tail.map { case (c, n) => c.as(n) }: _*)
    partial
      .groupBy(col("__k"))
      .agg(merged.head._2(merged.head._1).as(merged.head._1),
           merged.tail.map { case (n, f) => f(n).as(n) }: _*)
      .withColumnRenamed("__k", "key")
  }
}
