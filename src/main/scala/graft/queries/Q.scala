package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** One declared capability from SURVEY.md §2: a Spark query plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Oracle-parity rules (SURVEY.md §7.4 — nondeterminism mitigations):
  *   - every query ends in a TOTAL order (tie-broken to uniqueness);
  *   - double sums are computed as exact decimal sums (order-independent)
  *     and averages as `cast(decimal_sum as double) / count` so the single
  *     IEEE division is bit-identical across engines;
  *   - columns are aliased identically on both sides (driver sorts columns
  *     by name before hashing);
  *   - order-sensitive float reductions round to a fixed scale.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Q {
  /** Load a fixture table (see [[graft.Tables]]). */
  def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Load with parallelism spread — for compute-heavy-per-row stages
    * over narrow scans (see [[graft.Tables.loadSpread]]).
    */
  def TS(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)
}
