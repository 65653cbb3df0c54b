package graft

import org.apache.spark.sql.SparkSession

/** Shared session-level I/O tuning for every graft main (r22, guide
  * §1.2 step 3 — config AFTER the algorithm, from measurement).
  *
  * Root cause (thread-dump-attributed): with `shuffle.partitions` at
  * the local core count (32 ≤ the 200 default
  * `spark.shuffle.sort.bypassMergeThreshold`), every SQL exchange write
  * picked `BypassMergeSortShuffleWriter`, which opens ONE FILE PER
  * REDUCER PER MAP TASK. On this sandbox's virtio filesystem a file
  * create costs ~5-8 ms of kernel CPU, so every exchange map task paid
  * a fixed ~200-240 ms in `FileOutputStream.open0` regardless of row
  * count — the dominant cost of the whole bench at sf0.1 (measured:
  * a 3000-row scan+groupBy stage burned 7.6 s of task CPU; with the
  * serialized writer it is ~0.3-0.45 s).
  *
  *   - `spark.shuffle.sort.bypassMergeThreshold=1` forces the
  *     serialized (Unsafe) shuffle writer, which writes one spill file
  *     + one index per map task instead of R files. At production
  *     reducer counts (R > 200) bypass never triggers anyway, so this
  *     only makes small-R behavior match the large-R path — strictly
  *     fewer file creates at every scale, not a local[32] special.
  *   - `spark.local.dir` moves shuffle/spill/broadcast scratch to
  *     tmpfs when the host has one (/dev/shm), sidestepping the slow
  *     virtio file creates entirely; production deployments point this
  *     at fast local disks for exactly this reason (guide §2.1: local
  *     disk bandwidth can be the tighter shuffle limit).
  *
  * Both are env-overridable so a driver/operator can pin different
  * values without a rebuild: SPARK_GRAFT_BYPASS_THRESHOLD,
  * SPARK_GRAFT_LOCAL_DIR (set to "default" to keep the JVM default).
  */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val bypass = sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1")
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some(d) => if (d == "default") None else Some(d)
      case None =>
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-scratch")
        else None
    }
    val withBypass = b.config("spark.shuffle.sort.bypassMergeThreshold", bypass)
    localDir.fold(withBypass)(d => withBypass.config("spark.local.dir", d))
  }
}
