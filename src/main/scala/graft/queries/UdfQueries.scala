package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Extensions
import Q.T

/** Oracled queries for the user-extension surface
  * ([[graft.functions.Extensions]]): scalar UDF, typed Aggregator UDAF,
  * and the generator (UDTF) shape via posexplode over an array-returning
  * UDF. Each has a pure-SQL DuckDB reformulation, so the extension path
  * is held to the same correctness gate as builtins.
  */
object UdfQueries {

  /** Scalar UDF over part names; oracle recomputes the vowel count with
    * regex arithmetic.
    */
  private val udfScalar = Q(
    (s, dir) =>
      T(s, dir, "part")
        .select(col("p_partkey"),
                Extensions.vowelCount(col("p_name")).as("n_vowels"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
           |  cast(length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g')) as int)
           |    AS n_vowels
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Typed Aggregator (UDAF): exact integer sum of squares of
    * floor-scaled quantities, two-phase merged like a builtin agg.
    */
  private val udafSumsq = Q(
    (s, dir) => {
      val sumsq = udaf(Extensions.SumSq)
      T(s, dir, "lineitem")
        .withColumn("qs", floor(col("l_quantity") * 1000).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg(sumsq(col("qs")).as("sumsq_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  cast(sum(x * x) as bigint) AS sumsq_qty, count(*) AS n
           |FROM (SELECT l_returnflag,
           |        cast(floor(l_quantity * 1000) as bigint) AS x
           |      FROM lineitem)
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Generator (UDTF shape): posexplode over an array-returning UDF —
    * token bigrams with positions. Restricted to a doc prefix to keep
    * the oracle diff small; the operator itself is row-linear.
    */
  private val udtfBigrams = Q(
    (s, dir) =>
      T(s, dir, "documents")
        .where(col("doc_id") < 50)
        .select(col("doc_id"),
                posexplode(Extensions.bigrams(col("text"))).as(Seq("pos0", "bigram")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("bigram"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 50
           |)
           |SELECT doc_id,
           |  unnest(generate_series(1, len(tk) - 1)) AS pos,
           |  unnest(list_transform(generate_series(1, len(tk) - 1),
           |         i -> tk[i] || ' ' || tk[i + 1])) AS bigram
           |FROM t ORDER BY doc_id, pos""".stripMargin))

  val all: Map[String, Q] = Map(
    "udf_scalar_vowels" -> udfScalar,
    "udaf_sumsq" -> udafSumsq,
    "udtf_bigrams" -> udtfBigrams
  )
}
