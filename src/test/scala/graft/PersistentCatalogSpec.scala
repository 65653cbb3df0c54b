package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.sources.PersistentCatalog

/** The persistent-catalog contract: external tables live in the
  * metastore (not session temp views), survive a new session, carry
  * ANALYZE statistics, and those statistics steer the cost-based
  * optimizer.
  */
class PersistentCatalogSpec extends SparkSpec {

  private lazy val registered: Unit = {
    PersistentCatalog.registerExternal(spark, sfDir)
    PersistentCatalog.analyzeAll(spark)
  }

  test("catalog is Hive-backed with an on-disk metastore") {
    registered
    val ext = spark.sharedState.externalCatalog.unwrapped.getClass.getName
    assert(ext.contains("HiveExternalCatalog"), s"external catalog was $ext")
    assert(new java.io.File("target/test-metastore/metastore_db").isDirectory,
      "Derby metastore directory missing — catalog would not survive a restart")
  }

  test("external tables survive a new session (not temp views)") {
    registered
    val fresh = spark.newSession() // fresh temp-view namespace, shared catalog
    val n = fresh.table(PersistentCatalog.tableName("lineitem")).count()
    assert(n > 0)
    // a temp view registered in the ORIGINAL session must NOT leak into
    // the fresh one — proving the external table is a different animal
    spark.range(1).createOrReplaceTempView("g_only_in_session_one")
    assert(!fresh.catalog.tableExists("g_only_in_session_one"))
    assert(fresh.catalog.tableExists(PersistentCatalog.tableName("lineitem")))
  }

  test("ANALYZE stats are visible to the optimizer (rowCount + column stats)") {
    registered
    val t = spark.table(PersistentCatalog.tableName("lineitem"))
    val stats = t.queryExecution.optimizedPlan.stats
    val actual = t.count()
    assert(stats.rowCount.contains(BigInt(actual)),
      s"rowCount ${stats.rowCount} != analyzed $actual")
    assert(stats.attributeStats.nonEmpty, "no column-level stats after ANALYZE")
    val qty = stats.attributeStats.find(_._1.name == "l_quantity").map(_._2)
    assert(qty.exists(_.distinctCount.isDefined), "l_quantity NDV missing")
  }

  test("CBO uses stats: small analyzed table broadcasts without a hint") {
    registered
    def broadcastJoins(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case b: BroadcastHashJoinExec => b }
    // nation (25 rows, known via metastore stats) joined to a fact-side
    // table: the planner must pick a broadcast-hash join on its own —
    // no broadcast() hint anywhere in this query. (The exchange node
    // itself is only inserted at executedPlan time, so the assertion is
    // on the join strategy choice.)
    val fact = spark.table(PersistentCatalog.tableName("supplier"))
    val dim = spark.table(PersistentCatalog.tableName("nation"))
    val joined = fact.join(dim, fact("s_nationkey") === dim("n_nationkey"))
    val bx = broadcastJoins(joined.queryExecution.sparkPlan)
    assert(bx.nonEmpty, "stats-informed broadcast join not chosen")
  }

  test("Engine.persistent: one-call bootstrap yields a queryable engine over the catalog") {
    import graft.engine.{Engine, EngineConfig}
    // getOrCreate reuses the suite's Hive-backed context; bootstrap must
    // be idempotent over the already-registered external tables
    val e = Engine.persistent(
      EngineConfig(dataDir = sfDir, reapIntervalMs = 0L),
      warehouseDir = new java.io.File("target/test-warehouse").getAbsolutePath,
      metastoreDir = new java.io.File("target/test-metastore").getAbsolutePath)
    try {
      e.register("dim_count") { (s, _, _) =>
        s.table(PersistentCatalog.tableName("nation")).groupBy().count()
      }
      val rows = e.query("dim_count").get
      assert(rows.length == 1 && rows(0).getLong(0) == 25L)
      // stats survived the re-bootstrap (ANALYZE is idempotent)
      val stats = e.spark.table(PersistentCatalog.tableName("nation"))
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)))
    } finally e.shutdown()
  }

  test("CBO join reorder: selective dimension pair joins before the fact") {
    registered
    // written worst-first: fact x fact, dims last. With cbo+joinReorder
    // ON (session default here), the optimizer is free to re-associate;
    // with CBO OFF in an otherwise identical session the join tree must
    // keep the authored order. The assertion is that the two plans
    // DIFFER — i.e. the statistics actually changed the plan.
    def plan(s: org.apache.spark.sql.SparkSession): String = {
      val o = s.table(PersistentCatalog.tableName("orders"))
      val l = s.table(PersistentCatalog.tableName("lineitem"))
      val c = s.table(PersistentCatalog.tableName("customer"))
      val n = s.table(PersistentCatalog.tableName("nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .where(n("n_name") === "FRANCE")
        .groupBy(n("n_name")).count()
        .queryExecution.optimizedPlan.treeString
    }
    val cboOn = plan(spark)
    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    off.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    val cboOff = plan(off)
    assert(cboOn != cboOff,
      "CBO on/off produced identical optimized plans — stats not consulted")
  }
}
