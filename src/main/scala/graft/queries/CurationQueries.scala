package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.{T, TS}

/** SURVEY.md §2C, round-10 additions — corpus-curation operators a
  * training-data pipeline runs between crawl and tokenizer: per-document
  * entropy quality signals, deterministic train/val/test splits,
  * snapshot-to-snapshot delta accounting, and BPE merge-pair induction.
  * Same oracle-parity rules as [[NorthStarQueries]] (total order, exact
  * integer sums for order-sensitive reductions, one terminal rounding of
  * any transcendental-derived float).
  *
  * Reference analog: the reference delegates all document processing to
  * its SQL handle (`/root/reference/src/processor.ts:26`); these extend
  * that surface the same way the rest of §2C does.
  */
object CurationQueries {

  // ---------------------------------------------------------------------
  // Character-entropy quality signals
  // ---------------------------------------------------------------------

  /** ln(2) as one shared double literal so the bits conversion divides by
    * the identical constant in both engines.
    */
  private val LN2 = "0.6931471805599453"

  /** Per-document character-level Shannon entropy + concentration
    * signals (the Gopher/C4-family quality filters that catch binary
    * junk, repeated-character padding, and single-script spam that
    * word-level stats miss): distinct-character count, top-character
    * fraction, and entropy in bits.
    *
    * Determinism: the per-character terms `floor(c * ln(c) * 1e6)` are
    * exact bigints summed order-independently; `ln` appears once per
    * term and once for the doc total, and the final expression rounds to
    * 6 dp — the same single-terminal-rounding mitigation as
    * [[NorthStarQueries.textTfidf]]'s idf.
    *
    * Scale: one (doc, char)-keyed aggregate with map-side partials
    * (alphabet-bounded per doc), then a doc-keyed rollup — both shuffles
    * carry counts, never text. No windows, no driver state.
    */
  private val textEntropy = Q(
    (s, dir) => {
      val cc = TS(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
      cc.groupBy(col("doc_id"))
        .agg(
          sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("cmax"),
          sum(floor(col("c").cast("double") * log(col("c").cast("double")) * lit(1e6))
            .cast("long")).as("s_clnc"))
        .select(
          col("doc_id"),
          col("n").cast("long").as("n_chars_tok"),
          col("n_distinct"),
          round(col("cmax").cast("double") / col("n"), 6).as("top_char_frac"),
          round((log(col("n").cast("double")) -
            col("s_clnc").cast("double") / lit(1e6) / col("n")) / expr(LN2), 6)
            .as("entropy_bits"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ch AS (
            |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
            |), cc AS (
            |  SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
            |), ag AS (
            |  SELECT doc_id, cast(sum(c) as bigint) AS n, count(*) AS n_distinct,
            |    max(c) AS cmax,
            |    cast(sum(cast(floor(c * ln(c) * 1e6) as bigint)) as bigint) AS s_clnc
            |  FROM cc GROUP BY doc_id
            |)
            |SELECT doc_id, n AS n_chars_tok, n_distinct,
            |  round(cast(cmax as double) / n, 6) AS top_char_frac,
            |  round((ln(n) - cast(s_clnc as double) / 1e6 / n) / $LN2, 6)
            |    AS entropy_bits
            |FROM ag ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Deterministic train/val/test split
  // ---------------------------------------------------------------------

  /** Deterministic 90/5/5 train/val/test assignment by salted content-id
    * hash — the split every training run needs to be reproducible across
    * re-ingests (membership is a pure function of doc_id, so a re-crawled
    * corpus lands each doc in the same split). Reports per-(split, lang)
    * volumes; the id ranges double as a disjointness spot-check.
    *
    * Scale: the hash coin is map-only (same md5 idiom as
    * [[NorthStarQueries.sampleHash]]); the only shuffle is the tiny
    * (split, lang) rollup.
    */
  private val corpusSplit = Q(
    (s, dir) =>
      T(s, dir, "documents")
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('sp:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 100"))
        .withColumn("split",
          when(col("h") < 90, "train").when(col("h") < 95, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("sum_chars"),
             min(col("doc_id")).as("min_id"),
             max(col("doc_id")).as("max_id"))
        .orderBy(col("split"), col("lang")),
    Some("""WITH h AS (
           |  SELECT *, cast('0x' || substr(md5('sp:' || cast(doc_id as varchar)), 1, 8) as bigint) % 100 AS h
           |  FROM documents
           |)
           |SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
           |  lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------------
  // Snapshot delta (corpus versioning)
  // ---------------------------------------------------------------------

  /** Snapshot-to-snapshot delta accounting — the audit a versioned corpus
    * store (crawl N vs crawl N+1) publishes with every release: how many
    * docs were added / removed / changed / unchanged, by source. The
    * "new" snapshot is derived deterministically from the fixture (drops
    * doc_id % 10 == 3, edits the text of doc_id % 7 == 0, ingests a new
    * doc per doc_id % 13 == 0 under shifted ids), so both engines diff
    * the identical pair of corpora.
    *
    * Scale: content hashes are map-side sha256; the diff is ONE
    * doc_id-keyed full-outer join (the id spine is the shuffle key, the
    * payload is a 64-char hash, never the text); the status rollup is
    * tiny. At 100 TB this is the plan you want: no text movement, no
    * all-pairs, one key-partitioned exchange.
    */
  private val pipelineDelta = Q(
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val old = docs.select(col("doc_id"), col("source"),
        sha2(col("text"), 256).as("h"))
      val edited = docs
        .where(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), col("source"),
          sha2(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")), 256).as("h"))
      val ingested = docs
        .where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), lit("ingest").as("source"),
          sha2(concat(lit("new:"), col("text")), 256).as("h"))
      val neu = edited.unionAll(ingested)
      old.select(col("doc_id"), col("source").as("src_old"), col("h").as("h_old"))
        .join(neu.select(col("doc_id"), col("source").as("src_new"), col("h").as("h_new")),
          Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("status"), coalesce(col("src_new"), col("src_old")).as("source"))
        .agg(count(lit(1)).as("n_docs"),
             min(col("doc_id")).as("min_id"),
             max(col("doc_id")).as("max_id"))
        .orderBy(col("status"), col("source"))
    },
    Some("""WITH old AS (
           |  SELECT doc_id, source, sha256(text) AS h FROM documents
           |), neu AS (
           |  SELECT doc_id, source,
           |    sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END) AS h
           |  FROM documents WHERE doc_id % 10 <> 3
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, 'ingest' AS source,
           |    sha256('new:' || text) AS h
           |  FROM documents WHERE doc_id % 13 = 0
           |), d AS (
           |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           |    coalesce(n.source, o.source) AS source,
           |    CASE WHEN o.h IS NULL THEN 'added'
           |         WHEN n.h IS NULL THEN 'removed'
           |         WHEN o.h <> n.h THEN 'changed'
           |         ELSE 'unchanged' END AS status
           |  FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id
           |)
           |SELECT status, source, count(*) AS n_docs,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM d GROUP BY status, source ORDER BY status, source""".stripMargin))

  // ---------------------------------------------------------------------
  // BPE merge-pair induction
  // ---------------------------------------------------------------------

  /** First BPE merge round — the corpus-wide statistic a tokenizer
    * trainer computes over and over: adjacent character-pair frequencies
    * weighted by word occurrence counts, ranked to the top-20 merge
    * candidates (count desc, pair asc — a total order).
    *
    * Scale: this is the two-level trick that makes BPE training feasible
    * on 100 TB — the corpus collapses to its word-count table FIRST
    * (vocabulary-keyed aggregate), and the pair explode runs over
    * DISTINCT words weighted by their counts, so pair extraction is
    * proportional to the vocabulary, not the token stream. The rank
    * window runs on the pair-vocabulary table (alphabet², tiny).
    */
  private val textBpeMerges = Q(
    (s, dir) => {
      val wc = TS(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .where(length(col("w")) >= 2)
      val pairs = wc
        .select(col("c"),
          explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 2))"))
            .as("pair"))
        .where(length(col("pair")) === 2)
        .groupBy(col("pair"))
        .agg(sum(col("c")).as("n_occ"), count(lit(1)).as("n_words"))
      pairs
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n_occ").desc, col("pair"))))
        .where(col("rnk") <= 20)
        .select(col("rnk"), col("pair"), col("n_occ"), col("n_words"))
        .orderBy(col("rnk"))
    },
    Some("""WITH wc AS (
           |  SELECT w, count(*) AS c FROM (
           |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           |  GROUP BY w HAVING len(w) >= 2
           |), pairs AS (
           |  SELECT pair, cast(sum(c) as bigint) AS n_occ, count(*) AS n_words FROM (
           |    SELECT c, unnest(list_transform(generate_series(1, len(w)),
           |      i -> substr(w, i, 2))) AS pair
           |    FROM wc
           |  ) WHERE len(pair) = 2 GROUP BY pair
           |), r AS (
           |  SELECT pair, n_occ, n_words,
           |    row_number() OVER (ORDER BY n_occ DESC, pair) AS rnk
           |  FROM pairs
           |)
           |SELECT rnk, pair, n_occ, n_words FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin))

  val all: Map[String, Q] = Map(
    "ns_text_entropy" -> textEntropy,
    "ns_corpus_split" -> corpusSplit,
    "ns_pipeline_delta" -> pipelineDelta,
    "ns_text_bpe_merges" -> textBpeMerges
  )
}
