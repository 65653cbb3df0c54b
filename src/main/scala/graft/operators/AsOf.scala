package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the latest right
  * row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no built-in as-of join (SURVEY.md §2B Joins, §4.2). The naive
  * formulation — a range join + per-left-row max — explodes to
  * O(|L| x |R| / keys) intermediate rows. This implementation uses the
  * union-and-window trick instead: tag both sides, union them, and run a
  * single `last(payload, ignoreNulls)` window ordered by (time, side).
  * Cost is ONE shuffle on the key (the window's partitionBy) over |L|+|R|
  * rows — no row explosion — which is the formulation that survives a
  * 100 TB fact table (it's the standard point-in-time-join pattern used by
  * large-scale feature stores).
  *
  * Right rows sort before left rows at equal timestamps (side 0 < side 1),
  * so an exactly-equal right timestamp IS visible to the left row
  * (`<=` semantics). Ties among right rows at the same timestamp resolve
  * to the greatest payload via the ordering on (time, side, payload),
  * keeping the result deterministic.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      payload: Column,
      payloadName: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", leftKey)
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.select(payload).schema.head.dataType))
    val r = right
      .select(rightKey.as("__k"), rightTime.as("__t"), payload.as("__p"))
      .withColumn("__side", lit(0))
    // unionByName with missing-column fill keeps left's payload slot null
    val unioned = l.select((leftCols.map(col) :+ col("__k") :+ col("__t") :+
        col("__side") :+ col("__p")): _*)
      .unionByName(
        r.select(col("__k"), col("__t"), col("__side"), col("__p")),
        allowMissingColumns = true)
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payloadName, last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__k", "__t", "__side", "__p")
  }
}
