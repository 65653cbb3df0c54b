package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.udf

/** User-extension surface (SURVEY.md §2B UDF/UDAF/UDTF) — the Spark
  * analog of the reference's `call(cmd, impl)` arbitrary-user-code
  * extension point (`/root/reference/src/processor.ts:57-59,25-27`).
  *
  * These exist to prove the extension SURFACE; per the Spark-first rule,
  * logic expressible with builtins stays builtin (codegen). A UDF is the
  * escape hatch, not the default — each is deliberately deterministic so
  * the DuckDB oracle can reproduce it.
  */
object Extensions {

  /** Scalar UDF: vowel count per string. */
  val vowelCount = udf { s: String =>
    if (s == null) 0 else s.count("aeiou".contains(_))
  }

  /** Array-returning UDF — exploded downstream, i.e. the UDTF shape
    * (generator via `posexplode(udf(...))`).
    */
  val bigrams = udf { s: String =>
    if (s == null) Seq.empty[String]
    else {
      val t = s.split(' ')
      (0 until math.max(t.length - 1, 0)).map(i => t(i) + " " + t(i + 1))
    }
  }

  /** Typed UDAF: exact sum of squares over longs (inputs pre-scaled by
    * the caller so the arithmetic is integer-exact and cross-engine
    * deterministic). Two-phase (partial merge) like any builtin agg.
    */
  object SumSq extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a * a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
