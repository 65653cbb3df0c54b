package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the nearest
  * right row with the same key — at-or-before by default (`Backward`),
  * optionally strictly-before, at-or-after (`Forward`), or strictly-after.
  *
  * Spark has no built-in as-of join (SURVEY.md §2B Joins, §4.2). The naive
  * formulation — a range join + per-left-row max — explodes to
  * O(|L| x |R| / keys) intermediate rows. This implementation uses the
  * union-and-window trick instead: tag both sides, union them, and run a
  * single `last`/`first`(ignoreNulls) window ordered by (time, side).
  * Cost is ONE shuffle on the key (the window's partitionBy) over |L|+|R|
  * rows — no row explosion — which is the formulation that survives a
  * 100 TB fact table (the standard point-in-time-join pattern of
  * large-scale feature stores). Skewed keys are handled by AQE the same
  * as any other single-key shuffle.
  *
  * Inclusivity is encoded purely in the side sort order at equal
  * timestamps: for inclusive joins the right row sorts toward the left
  * row's window frame; for strict joins it sorts out of it. Ties among
  * right rows at the same timestamp resolve to the greatest payload
  * (via the payload sort within the frame), keeping results
  * deterministic.
  */
object AsOf {

  sealed trait Direction
  /** Nearest right row at-or-before (strict: strictly-before) left time. */
  case object Backward extends Direction
  /** Nearest right row at-or-after (strict: strictly-after) left time. */
  case object Forward extends Direction

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      payload: Column,
      payloadName: String,
      direction: Direction = Backward,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // Side ordering at equal timestamps decides inclusivity (see scaladoc):
    //   Backward inclusive:  right(0) < left(1)  — equal-t right visible
    //   Backward strict:     left(0)  < right(1) — equal-t right excluded
    //   Forward inclusive:   left(0)  < right(1) — equal-t right in tail frame
    //   Forward strict:      right(0) < left(1)  — equal-t right before frame
    val (leftSide, rightSide) = (direction, strict) match {
      case (Backward, false) | (Forward, true) => (1, 0)
      case (Backward, true) | (Forward, false) => (0, 1)
    }
    val l = left
      .withColumn("__k", leftKey)
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(leftSide))
      .withColumn("__p", lit(null).cast(right.select(payload).schema.head.dataType))
    val r = right
      .select(rightKey.as("__k"), rightTime.as("__t"), payload.as("__p"))
      .withColumn("__side", lit(rightSide))
    val unioned = l.select((leftCols.map(col) :+ col("__k") :+ col("__t") :+
        col("__side") :+ col("__p")): _*)
      .unionByName(
        r.select(col("__k"), col("__t"), col("__side"), col("__p")),
        allowMissingColumns = true)
    val picked = direction match {
      case Backward =>
        val w = Window
          .partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        last(col("__p"), ignoreNulls = true).over(w)
      case Forward =>
        val w = Window
          .partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__side").asc, col("__p").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        first(col("__p"), ignoreNulls = true).over(w)
    }
    unioned
      .withColumn(payloadName, picked)
      .where(col("__side") === leftSide)
      .drop("__k", "__t", "__side", "__p")
  }
}
