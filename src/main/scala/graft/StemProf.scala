package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StemProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vocab = Seq("dup", "vector", "hash", "join", "scan", "filter",
      "merge", "sort", "data", "table", "slow")
    import graft.queries.{PorterSql, Q}
    def t(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }
    val plain = Q.T(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(col("w").isin(vocab: _*))
    t("postings only") { plain.count() }
    val oldMorph = plain.withColumn("m", expr(
      """CASE WHEN (doc_id + pos) % 4 = 0 THEN w
        |  WHEN (doc_id + pos) % 4 = 1 THEN w || 's'
        |  WHEN (doc_id + pos) % 4 = 2 THEN w || 'ing'
        |  ELSE w || 'ed' END""".stripMargin))
    t("postings + simple morph") { oldMorph.count() }
    val base = Q.T(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(col("w").isin(vocab: _*))
      .withColumn("m", expr(graft.queries.CurationQueries.morphSql("w", "(doc_id + pos) % 4")))
    t("postings+morph count") { base.count() }
    val distinctM = base.select(col("m")).distinct()
    t("distinct m") { distinctM.count() }
    val stems = PorterSql.chain("m").foldLeft(distinctM) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql)) }
      .select(col("m"), col("stem"))
    t("stems subplan") { stems.count() }
    val joined = base.join(broadcast(stems), Seq("m"))
    t("join") { joined.count() }
    val triples = joined.groupBy(col("stem"), col("m"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    t("triples") { triples.count() }
    println(triples.queryExecution.executedPlan.toString.take(4000))
    val triples2 = joined.groupBy(col("m"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    t("triples-no-stem-key") { triples2.count() }
    val fin = triples.groupBy(col("stem"))
      .agg(countDistinct(col("m")).as("nf"), countDistinct(col("doc_id")).as("dd"),
        countDistinct(when(col("m") === col("stem"), col("doc_id"))).as("ddr"),
        sum(col("n")).as("np"))
    t("final") { fin.count() }
    spark.stop()
  }
}
