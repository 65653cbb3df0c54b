package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions.{GramHash, KMinValues, LshBucket, ScaledDotProduct, SortedOverlap, SquaredL2}

/** SparkSessionExtensions entry point (SURVEY.md §7.3): registers the
  * engine's native expressions into any session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * This is the idiomatic injection route for custom Catalyst pieces —
  * today only functions; a custom Rule/Strategy would be injected here
  * too if one ever became necessary (SURVEY §4.2 concluded none is for
  * the core contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("scaled_dot"), ScaledDotProduct.info, ScaledDotProduct.builder))
    ext.injectFunction(
      (FunctionIdentifier("kmv_sketch"), KMinValues.info, KMinValues.builder))
    ext.injectFunction(
      (FunctionIdentifier("sq_l2"), SquaredL2.info, SquaredL2.builder))
    ext.injectFunction(
      (FunctionIdentifier("lsh_bucket"), LshBucket.info, LshBucket.builder))
    ext.injectFunction(
      (FunctionIdentifier("sorted_overlap"), SortedOverlap.info, SortedOverlap.builder))
    ext.injectFunction(
      (FunctionIdentifier("gram_hash"), GramHash.info, GramHash.builder))
  }
}
