package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): times the headline `bench=true`
  * queries from SparkEntry at SPARK_GRAFT_SF_DIR, printing ONE JSON
  * line. Each query runs through the noop sink so the FULL physical
  * plan executes (count() would let Catalyst prune payload columns and
  * under-report; collect() would add driver materialization noise).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bench = SparkEntry.benchQueries.toSeq.sortBy(_._1)
    // Warm-up: one untimed pass at the smallest SF (JIT/codegen/classload)
    // and then one at the TARGET SF (file listing, page cache, AQE stats,
    // full-width codegen) so no timed run is the first to touch anything.
    val warmDirs = Seq("/root/testdata/sf0.001", sfDir).distinct
    warmDirs.foreach { wd =>
      if (new java.io.File(wd).isDirectory)
        bench.foreach { case (name, fn) =>
          try fn(spark, wd).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
        }
    }
    // Min of three timed runs per query: one-off GC/straggler pauses in
    // a shared local JVM otherwise dominate individual measurements
    // (observed: the same query varying 1.6s..5.6s across runs). A GC
    // breather before each query's timed block keeps garbage from the
    // warm-up passes and earlier queries from billing its pause to
    // whichever query happens to allocate next.
    val results = bench.map { case (name, fn) =>
      System.gc()
      Thread.sleep(200)
      // one untimed pass right before the timed block: the run after a
      // GC breather re-touches evicted cache lines / freshly-moved
      // objects and consistently reads ~0.3-1s high — pay that cost
      // outside the measurement.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    def obj(rows: Seq[(String, String)]): String =
      rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map { case (k, ts) => k -> ts.min.toString })
    // All raw per-run timings ride along so run-to-run variance is
    // visible in the artifact itself, not just the min.
    val runs = obj(results.map { case (k, ts) => k -> ts.mkString("[", ",", "]") })
    val total = results.map(_._2.min).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}"""
    // Emit to stdout (bare line — build.sbt routes forked run output
    // through StdoutOutput so no [info] prefix) AND to a well-known file,
    // so a log-scraping consumer and a file-reading one both parse it.
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_result.json"))
    // resolve/create the parent so the write cannot fail on a cwd that
    // is not the sbt project root or a missing target/ directory
    Option(out.toAbsolutePath.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out.toAbsolutePath, json + "\n")
    spark.stop()
  }
}
