package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Q, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in `graft.queries.*` as [[graft.queries.Q]]
  * entries (Spark query + optional DuckDB oracle); this object flattens
  * them into the driver's shape.
  */
object SparkEntry {

  /** Full declared inventory (SURVEY.md §2B/§2C, one entry per operator). */
  def catalog: Map[String, Q] =
    RelationalQueries.all ++
    graft.queries.TimeSeriesQueries.all ++
    graft.queries.NorthStarQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog("agg_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, LSH internals) -> driver records rows-only check.
    */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, Q(_, Some(sql), _)) => name -> sql }

  /** Headline subset for the benchmark harness. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.collect { case (name, q) if q.bench => name -> q.fn }
}
