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

  /** Fresh scratch directory for queries that must round-trip through
    * files (streaming fixtures): under `java.io.tmpdir`, never a
    * hardcoded repo path, so the query runs from any checkout and the
    * caller can [[scratchDelete]] the whole tree after materializing
    * its result (gate/bench/probe invocations must not accumulate
    * corpus-sized copies).
    */
  def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$prefix-").toString

  /** Best-effort recursive delete of a [[scratchDir]] tree. Call only
    * AFTER the result DataFrame is materialized (e.g. localCheckpoint) —
    * a lazy plan still reading the tree would break.
    */
  def scratchDelete(base: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val root = Paths.get(base)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  /** Load with parallelism spread — for compute-heavy-per-row stages
    * over narrow scans (see [[graft.Tables.loadSpread]]).
    */
  def TS(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.loadSpread(s, dir, name)
}
