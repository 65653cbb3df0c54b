package graft
import org.apache.spark.sql.SparkSession

/** Plan/timing diagnostics: `runMain graft.Explain <sfDir> <query...>`
  * prints each query's formatted physical plan and two consecutive
  * timed runs (cold + warm) through the noop sink.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // same native-expression registry as the Bench/Verify sessions,
      // so captured plans match what the bench executes (r22: the
      // gram_hash sites have no per-query registerIn fallback)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STATS=1 reproduces the bench/gate session shape
    // (stats-bearing catalog tables + CBO) for A/B plan comparison.
    if (sys.env.get("SPARK_GRAFT_STATS").contains("1"))
      Tables.registerWithStats(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"===== $name =====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
