package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** r22 diagnostic: isolate the fixed per-task CPU cost observed on
  * every 32-task scan stage (~200-240 ms/task regardless of row count).
  * Runs trivial scans under the bench session shape with varying split
  * configurations and prints per-stage task CPU.
  *
  * Usage: `runMain graft.ScanProbe [sfDir]`
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerWithStats(spark, sfDir)

    val agg = new ConcurrentHashMap[Int, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          val a = agg.computeIfAbsent(te.stageId, _ => new Array[Long](3))
          a.synchronized {
            a(0) += te.taskMetrics.executorRunTime
            a(1) += te.taskMetrics.executorCpuTime / 1000000L
            a(2) += 1
          }
        }
    })
    import scala.jdk.CollectionConverters._
    def run(label: String)(body: => Unit): Unit = {
      agg.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = agg.asScala.toSeq.sortBy(-_._2(1)).take(3)
        .map { case (id, a) => s"stage $id run ${a(0)} cpu ${a(1)} tasks ${a(2)}" }
      println(f"[scanprobe] $label%-40s wall $wall%.3f  ${rows.mkString(" | ")}")
    }

    val emb = s"$sfDir/embeddings.parquet"
    // warm everything once
    (1 to 3).foreach { _ =>
      spark.read.parquet(emb).write.mode("overwrite").format("noop").save()
    }
    (1 to 2).foreach { i =>
      run(s"plain scan noop #$i") {
        spark.read.parquet(emb).write.mode("overwrite").format("noop").save()
      }
    }
    run("scan via Tables.load") {
      Tables.load(spark, sfDir, "embeddings")
        .write.mode("overwrite").format("noop").save()
    }
    run("scan 1 split (maxPartitionBytes=1g, minPartitionNum=1)") {
      spark.read
        .option("mergeSchema", "false")
        .parquet(emb)
        .coalesce(1)
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.set("spark.sql.leafNodeDefaultParallelism", "1")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    (1 to 2).foreach { i =>
      run(s"scan minPartitionNum=1 #$i") {
        spark.read.parquet(emb).write.mode("overwrite").format("noop").save()
      }
    }
    spark.conf.unset("spark.sql.files.minPartitionNum")
    spark.conf.unset("spark.sql.leafNodeDefaultParallelism")
    // trivial CPU task with NO parquet: does the fixed cost follow tasks
    // or parquet splits?
    run("range(32 partitions) sum") {
      spark.range(0, 32000, 1, 32).selectExpr("sum(id)")
        .write.mode("overwrite").format("noop").save()
    }
    run("range(32 partitions) sum again") {
      spark.range(0, 32000, 1, 32).selectExpr("sum(id)")
        .write.mode("overwrite").format("noop").save()
    }
    // the loadSpread path the queries actually use
    import org.apache.spark.sql.functions._
    (1 to 2).foreach { i =>
      run(s"loadSpread noop #$i") {
        Tables.loadSpread(spark, sfDir, "embeddings")
          .write.mode("overwrite").format("noop").save()
      }
    }
    (1 to 2).foreach { i =>
      run(s"loadSpread + lsh_bucket + groupBy #$i") {
        Tables.loadSpread(spark, sfDir, "embeddings")
          .select(col("vec_id"), expr("lsh_bucket(embedding)").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    (1 to 2).foreach { i =>
      run(s"loadSpread project-only vec_id #$i") {
        Tables.loadSpread(spark, sfDir, "embeddings")
          .select(col("vec_id"))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    (1 to 2).foreach { i =>
      run(s"loadSpread documents lower(substr) groupBy #$i") {
        Tables.loadSpread(spark, sfDir, "documents")
          .select(lower(substring(col("text"), 1, 40)).as("title"), col("doc_id"))
          .groupBy(col("title"))
          .agg(min(col("doc_id")).as("sid"), count(lit(1)).as("n_docs"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}

/** Loops one query shape forever for thread-dump attribution. */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerWithStats(spark, sfDir)
    val fn = SparkEntry.queryFn(args.headOption.getOrElse("ns_sim_lsh_buckets")).get
    (1 to 500).foreach { i =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
