package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact squared L2 distance over two `array<bigint>` columns:
  * `sum_i (a_i - b_i)^2` as BIGINT — the inner loop of quantized k-means
  * assignment and PQ encode (see `ns_embed_kmeans` / `ns_sim_pq`, which
  * run on 2^14-quantized grids where every term is exact 63-bit-safe
  * integer math).
  *
  * Same escalation as [[ScaledDotProduct]]: the HOF formulation
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, ...)` is
  * interpreted per element (the dominant cost in the ScaleProbe PQ run);
  * this expression is one codegen'd loop inside whole-stage codegen with
  * no lambda dispatch and no intermediate array. Interpreted eval matches
  * codegen exactly (pure integer arithmetic).
  *
  * Arrays are paired up to the shorter length; null slots contribute 0.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_l2 expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sq_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        val d = xs.getLong(i) - ys.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  val info = new ExpressionInfo(
    classOf[SquaredL2].getCanonicalName, null, "sq_l2",
    "sq_l2(a, b) - exact bigint sum of (a[i]-b[i])^2.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SquaredL2(a, b)
    case other => throw new IllegalArgumentException(
      s"sq_l2 expects 2 arguments, got ${other.size}")
  }

  /** Idempotent per-session registration (same contract as
    * [[ScaledDotProduct.registerIn]]).
    */
  def registerIn(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sq_l2"), info, builder)
}
