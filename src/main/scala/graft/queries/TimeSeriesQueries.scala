package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q.T

/** Time-series / streaming-shaped queries over `events` (SURVEY.md §2B
  * Streaming). Each batch query here is the replay-equivalent of a
  * Structured Streaming query in [[graft.streaming.EventStreams]] — DuckDB
  * has no streaming, so the oracle checks the batch formulation and the
  * ScalaTest suite checks stream-vs-batch equivalence (SURVEY.md §5.2.5).
  */
object TimeSeriesQueries {

  /** Hourly time buckets — the batch shape of a tumbling hour window. */
  private val tsTimeBuckets = Q(
    (s, dir) =>
      T(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
           |  cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    bench = true)

  /** Tumbling 10-minute window via `window()` — epoch-aligned, so the
    * oracle reproduces the bucket start with integer epoch arithmetic.
    */
  private val tsTumblingWindow = Q(
    (s, dir) =>
      T(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type")),
    Some("""SELECT make_timestamp(cast(floor(epoch(ts) / 600) as bigint) * 600000000) AS w_start,
           |  event_type, count(*) AS n,
           |  cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin))

  /** Sliding window (10 min size, 5 min slide): every event lands in
    * exactly two windows; the oracle materializes both by cross-joining a
    * two-element offset table.
    */
  private val tsSlidingWindow = Q(
    (s, dir) =>
      T(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy(col("w_start")),
    Some("""SELECT make_timestamp((cast(floor(epoch(ts) / 300) as bigint) - k) * 300000000) AS w_start,
           |  count(*) AS n
           |FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
           |GROUP BY 1 ORDER BY w_start""".stripMargin))

  /** Session windows (30-minute gap) per user — `session_window` in Spark;
    * the oracle rebuilds sessions with the lag + cumulative-sum idiom.
    */
  private val tsSessionWindow = Q(
    (s, dir) =>
      T(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("s_start"), col("user_id"), col("n"))
        .orderBy(col("user_id"), col("s_start")),
    Some("""WITH flagged AS (
           |  SELECT user_id, ts,
           |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 OR
           |              lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           |), sess AS (
           |  SELECT user_id, ts,
           |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                   ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM flagged
           |)
           |SELECT min(ts) AS s_start, user_id, count(*) AS n
           |FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin))

  /** Sessionization via lag + cumulative sum (batch idiom; SURVEY.md §2B). */
  private val tsSessionization = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .withColumn("gap_s", col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
        .withColumn("brk", when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH flagged AS (
           |  SELECT user_id,
           |    CASE WHEN lag(ts) OVER w IS NULL OR
           |              epoch(ts) - epoch(lag(ts) OVER w) > 1800
           |         THEN 1 ELSE 0 END AS brk
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |)
           |SELECT user_id, cast(sum(brk) as bigint) AS n_sessions, count(*) AS n_events
           |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin),
    bench = true)

  /** Deterministic dedup-by-key: keep the earliest row per event_id (the
    * batch shape of streaming dropDuplicates; rank instead of
    * dropDuplicates so the kept row is well-defined for the oracle).
    */
  private val tsDedupEvents = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ts"), col("user_id"), col("event_type"))
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, ts, user_id, event_type FROM (
           |  SELECT event_id, ts, user_id, event_type,
           |    row_number() OVER (PARTITION BY event_id
           |                       ORDER BY ts, user_id, event_type) AS rn
           |  FROM events
           |) WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** Stream-static join shape: events (stream side) x customer (static
    * dim) — batch formulation for the oracle.
    */
  private val tsStreamStaticJoin = Q(
    (s, dir) => {
      val e = T(s, dir, "events")
      val c = T(s, dir, "customer")
      e.join(broadcast(c), e("user_id") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },
    Some("""SELECT c_mktsegment, event_type, count(*) AS n,
           |  cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin))

  /** JSON scalar functions over `events.props` (SURVEY.md §2B JSON). */
  private val tsJsonProps = Q(
    (s, dir) =>
      T(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          when(get_json_object(col("props"), "$.k").isNotNull, lit("has_k"))
            .otherwise(lit("no_k")).as("k_tag"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  cast(json_extract_string(props, '$.k') as int) AS k_int,
           |  CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
           |       THEN 'has_k' ELSE 'no_k' END AS k_tag
           |FROM events ORDER BY event_id""".stripMargin))

  /** Structured JSON functions over `events.props`: from_json with an
    * explicit schema, field extraction, json_tuple, and to_json
    * re-serialization (Spark's to_json omits null fields; the oracle
    * mirrors that).
    */
  private val tsJsonStruct = Q(
    (s, dir) =>
      T(s, dir, "events")
        .withColumn("st", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(
          col("event_id"),
          col("st.k").as("k_field"),
          json_tuple(col("props"), "k").as("k_tuple"),
          to_json(struct(col("event_id"), col("st.k").as("k"))).as("js"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  cast(json_extract_string(props, '$.k') as int) AS k_field,
           |  json_extract_string(props, '$.k') AS k_tuple,
           |  CASE WHEN json_extract_string(props, '$.k') IS NULL
           |       THEN '{"event_id":' || event_id || '}'
           |       ELSE '{"event_id":' || event_id || ',"k":'
           |            || cast(json_extract_string(props, '$.k') as int) || '}'
           |  END AS js
           |FROM events ORDER BY event_id""".stripMargin))

  /** Resample + forward-fill: snap each user's stream to a fixed hourly
    * grid (grown from the data's own [min, max] span with `sequence`, so
    * the grid is derived, never synthesized) and carry the last observed
    * value across the gaps — the standard "regularize an irregular time
    * series" prep before feature windows. Per (user, hour) the kept
    * observation is the LATEST event (total order (ts, event_id) — a
    * map-side rank-1 prune); the fill itself is one IGNORE NULLS running
    * window per user. The grid is |users| x |hours| — at 100 TB the hour
    * spine stays tiny (it scales with the time span, not the event
    * count) and broadcasts, so the only event-sized shuffle is the
    * per-user-hour top-1.
    */
  private val tsResampleFfill = Q(
    (s, dir) => {
      val ev = T(s, dir, "events").where(col("user_id") < 8)
      val hours = T(s, dir, "events")
        .agg(date_trunc("hour", min(col("ts"))).as("min_h"),
             date_trunc("hour", max(col("ts"))).as("max_h"))
        .select(explode(expr("sequence(min_h, max_h, interval 1 hour)")).as("h"))
      val grid = ev.select(col("user_id")).distinct().crossJoin(broadcast(hours))
      val rk = Window.partitionBy(col("user_id"), col("h"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val perHour = ev
        .withColumn("h", date_trunc("hour", col("ts")))
        .withColumn("rk", row_number().over(rk))
        .where(col("rk") === 1)
        .select(col("user_id"), col("h"), col("value").as("v"))
      val fill = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(perHour, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(fill).as("value_ffill"),
          col("v").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("h"))
    },
    Some("""WITH bounds AS (
           |  SELECT date_trunc('hour', min(ts)) AS min_h,
           |         date_trunc('hour', max(ts)) AS max_h FROM events
           |), hours AS (
           |  SELECT unnest(generate_series(min_h, max_h, INTERVAL 1 HOUR)) AS h FROM bounds
           |), users AS (
           |  SELECT DISTINCT user_id FROM events WHERE user_id < 8
           |), per_hour AS (
           |  SELECT user_id, h, v FROM (
           |    SELECT user_id, date_trunc('hour', ts) AS h, value AS v,
           |      row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
           |                         ORDER BY ts DESC, event_id DESC) AS rk
           |    FROM events WHERE user_id < 8
           |  ) WHERE rk = 1
           |)
           |SELECT u.user_id, hrs.h,
           |  last_value(p.v IGNORE NULLS) OVER (PARTITION BY u.user_id ORDER BY hrs.h
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           |  p.v IS NULL AS is_gap
           |FROM users u CROSS JOIN hours hrs
           |LEFT JOIN per_hour p ON p.user_id = u.user_id AND p.h = hrs.h
           |ORDER BY u.user_id, hrs.h""".stripMargin))

  /** Batch twin of the stream-STREAM interval join
    * ([[graft.streaming.EventStreams.purchaseClickAttribution]]): each
    * purchase matched with the same user's clicks in the preceding 30
    * minutes. The range bound is what makes the streaming form's state
    * finite; in batch Spark plans it as an equi-join on user_id with the
    * time range as a residual filter — one shuffle keyed by user.
    */
  private val tsClickAttribution = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
                col("event_id").as("purchase_id"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
                col("event_id").as("click_id"))
      p.join(c,
        col("p_user") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
          col("click_ts") <= col("purchase_ts"))
        .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
                col("purchase_ts"), col("click_ts"))
        .orderBy(col("purchase_id"), col("click_id"))
    },
    Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           |  p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
           |FROM events p JOIN events c
           |  ON p.user_id = c.user_id
           | AND p.event_type = 'purchase' AND c.event_type = 'click'
           | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
           |ORDER BY purchase_id, click_id""".stripMargin))

  /** Ordered funnel analysis: per user, the first `view`, the first
    * `click` at-or-after that view, and the first `purchase` at-or-after
    * that click — the conversion-funnel read every event pipeline runs.
    * Three conditional min-aggregates chained by joins, each keyed by
    * user (one shuffle key end-to-end, so the chain co-partitions);
    * `stage` counts how deep the user got. Timestamps compare exactly
    * in both engines (microsecond values from the same parquet).
    */
  private val tsFunnelAnalysis = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .where(col("ts") >= col("view_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .where(col("ts") >= col("click_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      ev.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"),
          (when(col("view_ts").isNotNull, 1).otherwise(0) +
           when(col("click_ts").isNotNull, 1).otherwise(0) +
           when(col("purchase_ts").isNotNull, 1).otherwise(0)).cast("bigint").as("stage"))
        .orderBy(col("user_id"))
    },
    Some("""WITH v AS (
           |  SELECT user_id, min(ts) AS view_ts FROM events
           |  WHERE event_type = 'view' GROUP BY user_id
           |), c AS (
           |  SELECT e.user_id, min(e.ts) AS click_ts
           |  FROM events e JOIN v ON e.user_id = v.user_id
           |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
           |  GROUP BY e.user_id
           |), p AS (
           |  SELECT e.user_id, min(e.ts) AS purchase_ts
           |  FROM events e JOIN c ON e.user_id = c.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
           |  GROUP BY e.user_id
           |)
           |SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           |  cast((CASE WHEN v.view_ts IS NOT NULL THEN 1 ELSE 0 END) +
           |       (CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END) +
           |       (CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS stage
           |FROM (SELECT DISTINCT user_id FROM events) u
           |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           |LEFT JOIN p USING (user_id)
           |ORDER BY user_id""".stripMargin))

  /** OHLC downsampling: per (event_type, hour) candlesticks —
    * open/close = the value of the first/last event in the bucket
    * (total order (ts, event_id) so ties are deterministic), high/low =
    * min/max, volume = exact decimal sum. The classic
    * irregular-to-bar-series compaction; one shuffle keyed by the
    * bucket, open/close via two rank-only windows over the same sort
    * (WindowGroupLimit prunes both map-side), never a per-bucket
    * collect.
    */
  private val tsOhlcDownsample = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .withColumn("h", date_trunc("hour", col("ts")))
      val asc = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("ts"), col("event_id"))
      val desc = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rk_open", row_number().over(asc))
        .withColumn("rk_close", row_number().over(desc))
        .groupBy(col("event_type"), col("h"))
        .agg(
          max(when(col("rk_open") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rk_close") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("volume"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""WITH ranked AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h, value,
           |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
           |                       ORDER BY ts, event_id) AS rk_open,
           |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
           |                       ORDER BY ts DESC, event_id DESC) AS rk_close
           |  FROM events
           |)
           |SELECT event_type, h,
           |  max(CASE WHEN rk_open = 1 THEN value END) AS open,
           |  max(value) AS high, min(value) AS low,
           |  max(CASE WHEN rk_close = 1 THEN value END) AS close,
           |  count(*) AS n,
           |  cast(sum(cast(value as decimal(18,4))) as double) AS volume
           |FROM ranked GROUP BY event_type, h
           |ORDER BY event_type, h""".stripMargin))

  /** Rolling z-score anomaly flags per user: each event's value against
    * the PRECEDING 20 events' mean/std (frame excludes the current row,
    * so an outlier can't mask itself). The |z| > 3 test is evaluated as
    * the EXACT decimal inequality (n*v - sum)^2 > 9*(n*sumsq - sum^2) —
    * algebraically identical to (v-mean)^2 > 9*var_pop but with zero
    * floating point, so both engines flag identical rows. One shuffle
    * keyed by user; the window is a single ordered pass. Flag is null
    * until 5 observations exist.
    */
  private val tsAnomalyZscore = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").cast("decimal(18,4)").as("v"))
        .withColumn("n", count(col("v")).over(w))
        .withColumn("sv", sum(col("v")).over(w))
        .withColumn("svv", sum(col("v") * col("v")).over(w))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("v").cast("double").as("value"),
          // warm-up rows (< 5 observations) report false, not null — a
          // nullable boolean reprs differently through the two engines'
          // pandas paths (None vs NaN) and would fail the driver hash
          (col("n") >= 5 &&
            (col("n") * col("v") - col("sv")) * (col("n") * col("v") - col("sv")) >
              lit(9) * (col("n") * col("svv") - col("sv") * col("sv")))
            .as("is_anomaly"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""WITH d AS (
           |  SELECT user_id, ts, event_id, cast(value as decimal(18,4)) AS v
           |  FROM events
           |), win AS (
           |  SELECT user_id, ts, event_id, v,
           |    count(v) OVER w AS n, sum(v) OVER w AS sv, sum(v * v) OVER w AS svv
           |  FROM d
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
           |)
           |SELECT user_id, ts, event_id, cast(v as double) AS value,
           |  n >= 5 AND
           |    (n * v - sv) * (n * v - sv) > 9 * (n * svv - sv * sv) AS is_anomaly
           |FROM win ORDER BY user_id, ts, event_id""".stripMargin))

  /** Cohort retention matrix: users grouped by first-seen day (the
    * cohort), counted by how many distinct users from each cohort are
    * active N days later — the activation/retention read behind every
    * growth dashboard. Two aggregates, both keyed by user then by
    * (cohort, offset): the first-seen pass is a per-user min (map-side
    * partial), the matrix pass counts distinct users per cell — no
    * event-sized shuffle happens twice. All exact integers and dates.
    */
  private val tsRetentionCohorts = Q(
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .where(col("day_offset").isin(0, 1, 7, 14))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, cast(ts as date) AS d FROM events
           |), first AS (
           |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id
           |)
           |SELECT f.cohort_day, datediff('day', f.cohort_day, e.d) AS day_offset,
           |  count(DISTINCT e.user_id) AS n_active
           |FROM ev e JOIN first f ON e.user_id = f.user_id
           |WHERE datediff('day', f.cohort_day, e.d) IN (0, 1, 7, 14)
           |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin))

  /** Spark 4 VARIANT over `events.props`: parse once into the binary
    * semi-structured type, then typed path extraction — the
    * schema-on-read shape for ragged JSON at scale (shredded storage,
    * no per-query string re-parse). The oracle extracts the same paths
    * with DuckDB's JSON functions; outputs are plain ints/booleans.
    */
  private val tsJsonVariant = Q(
    (s, dir) =>
      T(s, dir, "events")
        .withColumn("vr", parse_json(col("props")))
        .select(
          col("event_id"),
          expr("variant_get(vr, '$.k', 'int')").as("k_int"),
          expr("variant_get(vr, '$.k', 'int')").isNotNull.as("has_k"),
          coalesce(expr("is_variant_null(variant_get(vr, '$.missing'))"), lit(false))
            .as("missing_is_null"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  cast(json_extract_string(props, '$.k') as int) AS k_int,
           |  json_extract_string(props, '$.k') IS NOT NULL AS has_k,
           |  false AS missing_is_null
           |FROM events ORDER BY event_id""".stripMargin))

  /** PEAK CONCURRENT SESSIONS per day — the capacity gauge behind
    * serving/ingest sizing that none of the per-user session views
    * answer (sessionization counts sessions; this counts how many
    * OVERLAP at the worst instant): sessions are the proven 30-minute
    * -gap intervals, each contributes +1 at its start and -1 at its
    * end, and the peak is the maximum of the running sum — computed
    * WITHOUT a global unpartitioned window: the running sum partitions
    * BY DAY (the short-key time-block pattern), and sessions that
    * span midnight enter later days through an exact CARRY count (a
    * bounded per-session day explode — span days, not event rows).
    * The empty prefix counts (a day whose peak is its carry-in, before
    * any in-day event — the CUSUM running-min lesson); +1 orders
    * before -1 at equal timestamps (inclusive interval ends), with a
    * (us, delta, user, session) total order so every running value is
    * deterministic.
    *
    * Scale: one user-keyed session window (the sessionization
    * shuffle), one day-keyed delta window (fat partitions bounded by a
    * day's sessions), a span-bounded carry explode, and a day-keyed
    * rollup — nothing global, nothing quadratic.
    */
  private val tsConcurrencyPeak = Q(
    (s, dir) => {
      val uw = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sessions = T(s, dir, "events")
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("brk", when(lag(col("us"), 1).over(uw).isNull ||
          col("us") - lag(col("us"), 1).over(uw) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("st"), max(col("us")).as("en"))
        .withColumn("d_st", expr("st div 86400000000"))
        .withColumn("d_en", expr("en div 86400000000"))
        .localCheckpoint(true) // deltas + carry both read it
      val deltas = sessions
        .select(col("d_st").as("day_idx"), col("st").as("us"),
          lit(1L).as("delta"), col("user_id"), col("sid"))
        .unionAll(sessions.select(col("d_en").as("day_idx"), col("en").as("us"),
          lit(-1L).as("delta"), col("user_id"), col("sid")))
      val dw = Window.partitionBy(col("day_idx"))
        .orderBy(col("us"), col("delta").desc, col("user_id"), col("sid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inDay = deltas
        .withColumn("run", sum(col("delta")).over(dw))
        .groupBy(col("day_idx"))
        .agg(max(col("run")).as("max_run"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
      val carry = sessions
        .where(col("d_en") > col("d_st"))
        .select(explode(expr("sequence(d_st + 1, d_en)")).as("day_idx"))
        .groupBy(col("day_idx"))
        .agg(count(lit(1)).as("carried_in"))
      inDay.join(carry, Seq("day_idx"), "full_outer")
        .withColumn("carried_in", coalesce(col("carried_in"), lit(0L)))
        .withColumn("n_starts", coalesce(col("n_starts"), lit(0L)))
        .withColumn("peak_concurrent",
          col("carried_in") + greatest(coalesce(col("max_run"), lit(0L)), lit(0L)))
        .select(col("day_idx"),
          expr("date_add(date'1970-01-01', cast(day_idx as int))").as("day_date"),
          (col("carried_in") + col("n_starts")).as("n_active"),
          col("n_starts"), col("carried_in"), col("peak_concurrent"))
        .orderBy(col("day_idx"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
           |), flagged AS (
           |  SELECT user_id, us,
           |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
           |         THEN 1 ELSE 0 END AS brk
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
           |), sid AS (
           |  SELECT user_id, us,
           |    cast(sum(brk) OVER (PARTITION BY user_id ORDER BY us
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS sid
           |  FROM flagged
           |), sess AS (
           |  SELECT user_id, sid, min(us) AS st, max(us) AS en,
           |    min(us) // 86400000000 AS d_st, max(us) // 86400000000 AS d_en
           |  FROM sid GROUP BY user_id, sid
           |), deltas AS (
           |  SELECT d_st AS day_idx, st AS us, 1 AS delta, user_id, sid FROM sess
           |  UNION ALL
           |  SELECT d_en, en, -1, user_id, sid FROM sess
           |), run AS (
           |  SELECT day_idx, delta,
           |    cast(sum(delta) OVER (PARTITION BY day_idx
           |      ORDER BY us, delta DESC, user_id, sid
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS run
           |  FROM deltas
           |), in_day AS (
           |  SELECT day_idx, max(run) AS max_run,
           |    cast(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) as bigint)
           |      AS n_starts
           |  FROM run GROUP BY day_idx
           |), carry AS (
           |  SELECT unnest(generate_series(d_st + 1, d_en)) AS day_idx
           |  FROM sess WHERE d_en > d_st
           |), carry_g AS (
           |  SELECT day_idx, cast(count(*) as bigint) AS carried_in
           |  FROM carry GROUP BY day_idx
           |)
           |SELECT coalesce(i.day_idx, c.day_idx) AS day_idx,
           |  DATE '1970-01-01' + cast(coalesce(i.day_idx, c.day_idx) as int)
           |    AS day_date,
           |  coalesce(c.carried_in, 0) + coalesce(i.n_starts, 0) AS n_active,
           |  coalesce(i.n_starts, 0) AS n_starts,
           |  coalesce(c.carried_in, 0) AS carried_in,
           |  coalesce(c.carried_in, 0) + greatest(coalesce(i.max_run, 0), 0)
           |    AS peak_concurrent
           |FROM in_day i FULL OUTER JOIN carry_g c ON i.day_idx = c.day_idx
           |ORDER BY day_idx""".stripMargin))

  val all: Map[String, Q] = Map(
    "ts_concurrency_peak" -> tsConcurrencyPeak,
    "ts_json_struct" -> tsJsonStruct,
    "ts_resample_ffill" -> tsResampleFfill,
    "ts_click_attribution" -> tsClickAttribution,
    "ts_funnel_analysis" -> tsFunnelAnalysis,
    "ts_json_variant" -> tsJsonVariant,
    "ts_ohlc_downsample" -> tsOhlcDownsample,
    "ts_anomaly_zscore" -> tsAnomalyZscore,
    "ts_retention_cohorts" -> tsRetentionCohorts,
    "ts_time_buckets" -> tsTimeBuckets,
    "ts_tumbling_window" -> tsTumblingWindow,
    "ts_sliding_window" -> tsSlidingWindow,
    "ts_session_window" -> tsSessionWindow,
    "ts_sessionization" -> tsSessionization,
    "ts_dedup_events" -> tsDedupEvents,
    "ts_stream_static_join" -> tsStreamStaticJoin,
    "ts_json_props" -> tsJsonProps
  )
}
