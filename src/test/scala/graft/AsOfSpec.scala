package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")), // after two right rows
      (1L, ts("2024-01-01 08:59:59")), // before any right row
      (2L, ts("2024-01-01 12:00:00")), // exactly equal timestamp
      (3L, ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r1a"),
      (1L, ts("2024-01-01 09:30:00"), "r1b"),
      (1L, ts("2024-01-01 11:00:00"), "r1c"), // after left row 1
      (2L, ts("2024-01-01 12:00:00"), "r2a")
    ).toDF("k", "t", "v")

    val out = AsOf.join(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        payload = col("v"), payloadName = "asof_v")
      .select(col("k"), col("t"), col("asof_v"))
      .orderBy(col("k"), col("t"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(2))))

    assert(out.toSeq == Seq(
      (1L, None),          // 08:59:59 — nothing at or before
      (1L, Some("r1b")),   // 10:00 — latest earlier is 09:30
      (2L, Some("r2a")),   // equal timestamps ARE visible (<= semantics)
      (3L, None)))         // no right rows for key
  }

  test("strict backward excludes equal timestamps; forward picks at-or-after") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at10"),
      (1L, ts("2024-01-01 11:00:00"), "at11")).toDF("k", "t", "v")

    def run(dir: AsOf.Direction, strict: Boolean) =
      AsOf.join(left, right, col("k"), col("k"), col("t"), col("t"),
          col("v"), "p", dir, strict)
        .orderBy(col("t")).collect().map(r => Option(r.getString(2))).toSeq

    assert(run(AsOf.Backward, strict = false) == Seq(Some("at10"), Some("at11")))
    // strict: the equal-timestamp right row at 10:00 is NOT visible
    assert(run(AsOf.Backward, strict = true) == Seq(None, Some("at11")))
    // forward: nearest at-or-after; 12:00 has nothing after it
    assert(run(AsOf.Forward, strict = false) == Seq(Some("at10"), None))
    // forward strict: 10:00 must skip its equal-timestamp row -> 11:00
    assert(run(AsOf.Forward, strict = true) == Seq(Some("at11"), None))
  }

  test("as-of join plan shuffles once on the key (no range explosion)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "x")).toDF("k", "t", "v")
    val plan = AsOf.join(left, right, col("k"), col("k"), col("t"), col("t"),
        col("v"), "p").queryExecution.executedPlan.toString
    // union + single window, not a join node: no BroadcastNestedLoopJoin
    assert(!plan.contains("NestedLoopJoin"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"), s"expected window-based plan:\n$plan")
  }
}
