package graft

import org.apache.spark.sql.functions._

import graft.expressions.ScaledDotProduct

/** The native expression must agree bit-for-bit with the HOF
  * formulation it replaced (the DuckDB oracle encodes the same math),
  * in both codegen and interpreted evaluation.
  */
class ScaledDotSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(embedding, embedding, (x, y) -> " +
      "cast(floor(cast(x as double) * cast(y as double) * 1099511627776) as bigint)), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"

  test("scaled_dot equals the HOF formulation on fixture embeddings") {
    ScaledDotProduct.registerIn(spark)
    val diff = Tables.load(spark, sfDir, "embeddings")
      .select(expr(hofDot).as("hof"), expr("scaled_dot(embedding, embedding)").as("native"))
      .where(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }

  test("scaled_dot works via SQL after registration and in interpreted mode") {
    ScaledDotProduct.registerIn(spark)
    val v = spark.sql(
      "SELECT scaled_dot(array(cast(0.5 as float), cast(-0.25 as float)), " +
      "array(cast(2.0 as float), cast(4.0 as float))) AS d").head().getLong(0)
    // floor(0.5*2*2^40) + floor(-0.25*4*2^40) = 2^40 + (-2^40)
    assert(v == 0L)
    // interpreted eval path (no codegen) must match
    val row = org.apache.spark.sql.catalyst.InternalRow.empty
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(0.5f, -0.25f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val lit2 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    assert(ScaledDotProduct(lit, lit2).eval(row) == 0L)
  }

  test("scaled_dot pairs up to the shorter array and skips null slots") {
    ScaledDotProduct.registerIn(spark)
    val v = spark.sql(
      "SELECT scaled_dot(array(cast(1.0 as float)), " +
      "array(cast(1.0 as float), cast(9.0 as float))) AS d").head().getLong(0)
    assert(v == 1099511627776L) // only the first pair contributes
    val n = spark.sql(
      "SELECT scaled_dot(array(cast(1.0 as float), cast(null as float)), " +
      "array(cast(1.0 as float), cast(2.0 as float))) AS d").head().getLong(0)
    assert(n == 1099511627776L) // null slot contributes 0
  }
}
