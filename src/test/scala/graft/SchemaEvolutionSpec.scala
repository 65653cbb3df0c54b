package graft

import org.apache.spark.sql.functions._

/** Footer-vs-declared schema reconciliation (VERDICT r13 item 8 — the
  * generalization of the r12 ts-encoding lesson): a fixture
  * regeneration that perturbs a NON-timestamp column must either be
  * sanctioned schema evolution (extra columns ignored, missing non-key
  * columns null-filled) or a LOUD, column-naming error (type drift,
  * missing key column) — never an opaque scan failure, never silent
  * misreads.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def perturbedDir(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val base = graft.queries.Q.scratchDir("schemaevo")
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    f(docs).write.mode("overwrite").parquet(s"$base/documents.parquet")
    base
  }

  test("extra file column is ignored by the declared ReadSchema") {
    val dir = perturbedDir(_.withColumn("added_by_regen", lit(42)))
    val df = Tables.load(spark, dir, "documents")
    assert(df.schema.fieldNames.toSeq == Tables.schemas("documents").fieldNames.toSeq)
    assert(df.count() == 50)
    graft.queries.Q.scratchDelete(dir)
  }

  test("missing non-key column is null-filled, not fatal") {
    val dir = perturbedDir(_.drop("lang"))
    val df = Tables.load(spark, dir, "documents")
    assert(df.schema.fieldNames.contains("lang"))
    assert(df.count() == 50)
    assert(df.where(col("lang").isNull).count() == 50, "lang must null-fill")
    assert(df.where(col("text").isNotNull).count() == 50, "other columns intact")
    graft.queries.Q.scratchDelete(dir)
  }

  test("type drift fails loudly, naming the column and both types") {
    val dir = perturbedDir(_.withColumn("n_chars", col("n_chars").cast("string")))
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "documents")
    }
    assert(e.getMessage.contains("n_chars"), e.getMessage)
    assert(e.getMessage.contains("bigint") && e.getMessage.contains("string"),
      e.getMessage)
    assert(e.getMessage.contains("type drift"), e.getMessage)
    graft.queries.Q.scratchDelete(dir)
  }

  test("missing key column refuses to null-fill") {
    val dir = perturbedDir(_.drop("doc_id"))
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "documents")
    }
    assert(e.getMessage.contains("doc_id"), e.getMessage)
    assert(e.getMessage.contains("key column"), e.getMessage)
    graft.queries.Q.scratchDelete(dir)
  }

  test("embeddings: array element type drift is caught (nested shape compare)") {
    val base = graft.queries.Q.scratchDir("schemaevo-emb")
    Tables.load(spark, sfDir, "embeddings").limit(10)
      .withColumn("embedding", expr("transform(embedding, x -> cast(x as double))"))
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      Tables.load(spark, base, "embeddings")
    }
    assert(e.getMessage.contains("embedding"), e.getMessage)
    graft.queries.Q.scratchDelete(base)
  }

  test("quantized-index cache invalidates on fixture regeneration") {
    // the r14 session-scoped index artifact must rebuild when the
    // embeddings fixture changes generation (mtime+size stamp), exactly
    // like the ts-encoding cache — a stale index over regenerated data
    // would be the r12 failure class in vector-search form
    val base = graft.queries.Q.scratchDir("idxregen")
    val src = Tables.load(spark, sfDir, "embeddings")
    src.limit(10).write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val idx1 = graft.queries.NorthStarQueries.kmeansQuantizedIndex(spark, base)
    assert(idx1.count() == 10)
    Thread.sleep(1100) // ensure a distinct mtime at 1s filesystem resolution
    src.limit(25).write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val idx2 = graft.queries.NorthStarQueries.kmeansQuantizedIndex(spark, base)
    assert(idx2.count() == 25, "regenerated fixture must rebuild the index")
    // and the same generation is served from cache (same checkpointed plan)
    val idx3 = graft.queries.NorthStarQueries.kmeansQuantizedIndex(spark, base)
    assert(idx3 eq idx2, "same generation must hit the cache")
    graft.queries.Q.scratchDelete(base)
  }

  test("real fixture dirs pass reconciliation unchanged") {
    // the gate's own tables must sail through (no false positives)
    Tables.schemas.keys.foreach { t =>
      assert(Tables.load(spark, sfDir, t).columns.nonEmpty, t)
    }
  }
}
