package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for one registered query (r22 optimization
  * diagnostics): runs the query once warm, once measured, and prints
  * every stage's id, task count, summed run/CPU ms, AND the stage's
  * name + call-site details, so a hot stage from the bench diag can be
  * mapped back to the operator that spawned it without the (disabled)
  * UI.
  *
  * Usage: `runMain graft.StageProf <queryName> [sfDir]`
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProf <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queryFn(name).getOrElse(
      sys.error(s"unknown query: $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerWithStats(spark, sfDir)

    final case class Agg(var runMs: Long = 0L, var cpuMs: Long = 0L,
        var tasks: Long = 0L, var name: String = "", var details: String = "")
    val stages = new ConcurrentHashMap[Int, Agg]()
    var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (enabled && te.taskMetrics != null) {
          val a = stages.computeIfAbsent(te.stageId, _ => Agg())
          a.synchronized {
            a.runMs += te.taskMetrics.executorRunTime
            a.cpuMs += te.taskMetrics.executorCpuTime / 1000000L
            a.tasks += 1
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (enabled) {
          val a = stages.computeIfAbsent(sc.stageInfo.stageId, _ => Agg())
          a.synchronized {
            a.name = sc.stageInfo.name
            a.details = sc.stageInfo.details.linesIterator
              .filterNot(_.contains("StageProf"))
              .take(4).mkString(" | ")
          }
        }
    })

    // warm-up (2 passes), then one measured run
    (1 to 2).foreach { _ =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    enabled = true
    val t0 = System.nanoTime()
    // construct INSIDE the measured region so eager construct-time jobs
    // (localCheckpoints) attribute too
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graftbench.ListenerFlush.drain(spark.sparkContext)
    println(f"[stageprof] $name wall ${wall}%.3f s")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2.runMs).foreach { case (id, a) =>
      println(f"[stageprof] stage $id%5d run ${a.runMs}%7d ms cpu " +
        f"${a.cpuMs}%7d ms tasks ${a.tasks}%4d  ${a.name}")
      if (a.details.nonEmpty) println(s"[stageprof]            ${a.details}")
    }
    spark.stop()
  }
}
