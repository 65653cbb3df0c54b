package graft.queries

import org.apache.spark.sql.functions._

import Q.T

/** SURVEY.md §2B scalar-function families — string, date/time, math,
  * array + higher-order, map, hash, and conversion — each exercised by
  * one oracled query. Engine-specific hash functions (xxhash64, crc32,
  * Murmur3 `hash`) have no DuckDB equivalent, so they run as a rows-only
  * query (oracle = None) alongside the md5/sha256 oracled one.
  *
  * All of these are Catalyst builtin expressions (whole-stage codegen'd,
  * no UDFs) — at 100 TB they evaluate inside the scan stage with zero
  * extra shuffles.
  */
object ScalarQueries {

  /** Exact, order-independent sum of a double column (see [[Q]]); final
    * cast to double so the output type matches the oracle's
    * `cast(sum(decimal) as double)` bit-for-bit in the driver's hash.
    */
  private def dsum(c: org.apache.spark.sql.Column, alias: String) =
    sum(c.cast("decimal(18,4)")).cast("double").as(alias)

  // ---------------------------------------------------------------------
  // Strings
  // ---------------------------------------------------------------------

  private val stringFuncs = Q(
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          upper(col("p_name")).as("name_up"),
          lower(col("p_brand")).as("brand_lo"),
          substring(col("p_name"), 1, 8).as("name_8"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          rpad(col("p_brand"), 12, ".").as("brand_pad"),
          reverse(col("p_brand")).as("brand_rev"),
          repeat(lit("ab"), 3).as("rep"),
          instr(col("p_name"), "a").as("first_a"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          levenshtein(col("p_brand"), col("p_type")).as("lev"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
          element_at(split(col("p_type"), " "), 1).as("type_head"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
           |  concat_ws('/', p_brand, p_type) AS brand_type,
           |  upper(p_name) AS name_up,
           |  lower(p_brand) AS brand_lo,
           |  substr(p_name, 1, 8) AS name_8,
           |  length(p_name) AS name_len,
           |  lpad(cast(p_size as varchar), 4, '0') AS size_pad,
           |  rpad(p_brand, 12, '.') AS brand_pad,
           |  reverse(p_brand) AS brand_rev,
           |  repeat('ab', 3) AS rep,
           |  instr(p_name, 'a') AS first_a,
           |  translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
           |  levenshtein(p_brand, p_type) AS lev,
           |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
           |  split_part(p_type, ' ', 1) AS type_head,
           |  trim('  x  ') AS trimmed
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Second string batch: formatting, char codes, affix tests. */
  private val stringFuncs2 = Q(
    (s, dir) =>
      T(s, dir, "nation")
        .select(
          col("n_nationkey"),
          format_string("%d/%s", col("n_nationkey"), col("n_name")).as("fmt"),
          ascii(col("n_name")).as("first_code"),
          expr("char(65 + n_nationkey % 26)").as("letter"),
          expr("left(n_name, 3)").as("head3"),
          expr("right(n_name, 3)").as("tail3"),
          col("n_name").contains("A").as("has_a"),
          col("n_name").startsWith("A").as("starts_a"),
          col("n_name").endsWith("A").as("ends_a"))
        .orderBy(col("n_nationkey")),
    Some("""SELECT n_nationkey,
           |  printf('%d/%s', n_nationkey, n_name) AS fmt,
           |  ascii(n_name) AS first_code,
           |  chr(65 + n_nationkey % 26) AS letter,
           |  left(n_name, 3) AS head3,
           |  right(n_name, 3) AS tail3,
           |  contains(n_name, 'A') AS has_a,
           |  starts_with(n_name, 'A') AS starts_a,
           |  ends_with(n_name, 'A') AS ends_a
           |FROM nation ORDER BY n_nationkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Date / time (UTC session, see build.sbt)
  // ---------------------------------------------------------------------

  private val datetimeFuncs = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .withColumn("od", col("o_orderdate").cast("date"))
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          hour(col("o_orderdate")).as("h"),
          minute(col("o_orderdate")).as("mi"),
          dayofweek(col("o_orderdate")).as("dow"), // Sunday=1 (DuckDB: +1)
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
          last_day(col("od")).as("mend"),
          date_add(col("od"), 30).as("plus30"),
          add_months(col("od"), 2).as("plus2mo"),
          datediff(lit("1998-12-31").cast("date"), col("od")).as("days_to_98"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          make_date(year(col("od")), lit(1), lit(1)).as("year_start"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |  year(o_orderdate) AS y,
           |  month(o_orderdate) AS m,
           |  day(o_orderdate) AS d,
           |  hour(o_orderdate) AS h,
           |  minute(o_orderdate) AS mi,
           |  dayofweek(o_orderdate) + 1 AS dow,
           |  date_trunc('month', o_orderdate) AS mstart,
           |  last_day(cast(o_orderdate as date)) AS mend,
           |  cast(o_orderdate as date) + 30 AS plus30,
           |  cast(cast(o_orderdate as date) + INTERVAL 2 MONTH as date) AS plus2mo,
           |  date_diff('day', cast(o_orderdate as date), DATE '1998-12-31') AS days_to_98,
           |  cast(floor(epoch(o_orderdate)) as bigint) AS epoch_s,
           |  make_date(year(o_orderdate), 1, 1) AS year_start
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Second date/time family batch: epoch round-trips and calendar
    * extraction (ISO week, quarter, day-of-year, date_sub).
    */
  private val datetimeFuncs2 = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .withColumn("od", col("o_orderdate").cast("date"))
        .select(
          col("o_orderkey"),
          weekofyear(col("od")).as("iso_week"),
          quarter(col("od")).as("q"),
          dayofyear(col("od")).as("doy"),
          from_unixtime(unix_timestamp(col("o_orderdate"))).as("ts_rt"),
          date_sub(col("od"), 15).as("minus15"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |  weekofyear(o_orderdate) AS iso_week,
           |  quarter(o_orderdate) AS q,
           |  dayofyear(o_orderdate) AS doy,
           |  strftime(to_timestamp(floor(epoch(o_orderdate))), '%Y-%m-%d %H:%M:%S') AS ts_rt,
           |  cast(o_orderdate as date) - 15 AS minus15
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Math
  // ---------------------------------------------------------------------

  /** Rounded where the value is irrational (sqrt/ln/trig) so the final
    * decimal rendering is identical; plain arithmetic is exact.
    */
  private val mathFuncs = Q(
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("size_dev"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
          round(pow(col("p_size").cast("double"), 2.0), 6).as("size_sq"),
          round(exp(col("p_size").cast("double") / 50), 6).as("size_exp"),
          round(log(col("p_retailprice")), 6).as("price_ln"),
          round(log10(col("p_retailprice")), 6).as("price_log10"),
          round(log2(col("p_retailprice")), 6).as("price_log2"),
          round(sin(col("p_size").cast("double")), 6).as("size_sin"),
          round(cos(col("p_size").cast("double")), 6).as("size_cos"),
          signum(col("p_size") - 25).cast("int").as("size_sign"),
          (col("p_partkey") % 7).as("key_mod7"),
          greatest(col("p_size"), lit(10)).as("size_hi"),
          least(col("p_size"), lit(40)).as("size_lo"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
           |  abs(p_size - 25) AS size_dev,
           |  cast(ceil(p_retailprice) as bigint) AS price_ceil,
           |  cast(floor(p_retailprice) as bigint) AS price_floor,
           |  round(sqrt(p_retailprice), 6) AS price_sqrt,
           |  round(pow(cast(p_size as double), 2.0), 6) AS size_sq,
           |  round(exp(cast(p_size as double) / 50), 6) AS size_exp,
           |  round(ln(p_retailprice), 6) AS price_ln,
           |  round(log10(p_retailprice), 6) AS price_log10,
           |  round(log2(p_retailprice), 6) AS price_log2,
           |  round(sin(cast(p_size as double)), 6) AS size_sin,
           |  round(cos(cast(p_size as double)), 6) AS size_cos,
           |  cast(sign(p_size - 25) as int) AS size_sign,
           |  p_partkey % 7 AS key_mod7,
           |  greatest(p_size, 10) AS size_hi,
           |  least(p_size, 40) AS size_lo
           |FROM part ORDER BY p_partkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Arrays + higher-order functions (embeddings.embedding)
  // ---------------------------------------------------------------------

  private val arrayHofFuncs = Q(
    (s, dir) =>
      T(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("n_dim"),
          // explicit zero normalization: Spark's decimal-based round turns
          // -0.00003 into +0.0 while DuckDB's keeps IEEE -0.0 — the
          // CASE maps both to literal +0.0 (a plain `+ 0` could be
          // algebraically simplified away by either optimizer).
          when(round(element_at(col("embedding"), 1).cast("double"), 4) === 0, lit(0.0))
            .otherwise(round(element_at(col("embedding"), 1).cast("double"), 4))
            .as("first_r"),
          // array outputs are serialized to CSV strings (driver's pandas
          // sort crashes on list cells); doubles go through decimal(12,4)
          // so both engines render the same padded-to-scale text.
          expr("concat_ws(',', transform(slice(embedding, 1, 4), " +
               "x -> cast(cast(round(cast(x as double), 4) as decimal(12,4)) as string)))")
            .as("head4_r"),
          expr("concat_ws(',', transform(" +
               "sort_array(transform(slice(embedding, 1, 8), x -> round(cast(x as double), 4))), " +
               "x -> cast(cast(x as decimal(12,4)) as string)))")
            .as("head8_sorted"),
          expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
          expr("exists(embedding, x -> x > 0.25)").as("has_gt_25"),
          expr("forall(embedding, x -> abs(x) < 1.0)").as("all_lt_1"),
          expr(s"aggregate(embedding, cast(0 as bigint), " +
               s"(acc, x) -> acc + cast(floor(cast(x as double) * 1099511627776) as bigint))")
            .as("sum_scaled"),
          expr("size(array_distinct(transform(embedding, x -> cast(floor(x * 10) as int))))")
            .as("n_decile_bins"),
          expr("size(flatten(array(slice(embedding, 1, 3), slice(embedding, 4, 3))))")
            .as("flat6"),
          expr("concat_ws(',', transform(sequence(1, 5), x -> cast(x as string)))")
            .as("seq5"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
           |  len(embedding) AS n_dim,
           |  CASE WHEN round(embedding[1]::double, 4) = 0 THEN 0.0
           |       ELSE round(embedding[1]::double, 4) END AS first_r,
           |  array_to_string(list_transform(embedding[1:4],
           |    x -> cast(cast(round(x::double, 4) as decimal(12,4)) as varchar)), ',') AS head4_r,
           |  array_to_string(list_transform(
           |    list_sort(list_transform(embedding[1:8], x -> round(x::double, 4))),
           |    x -> cast(cast(x as decimal(12,4)) as varchar)), ',') AS head8_sorted,
           |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
           |  len(list_filter(embedding, x -> x > 0.25)) > 0 AS has_gt_25,
           |  len(list_filter(embedding, x -> abs(x) >= 1.0)) = 0 AS all_lt_1,
           |  cast(list_sum(list_transform(embedding,
           |    x -> cast(floor(x::double * 1099511627776) as bigint))) as bigint) AS sum_scaled,
           |  len(list_distinct(list_transform(embedding,
           |    x -> cast(floor(x * 10) as int)))) AS n_decile_bins,
           |  len(flatten([embedding[1:3], embedding[4:6]])) AS flat6,
           |  array_to_string(generate_series(1, 5), ',') AS seq5
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Maps
  // ---------------------------------------------------------------------

  /** Map construction + key/value extraction on the Spark side; the
    * oracle reproduces the extracted VALUES directly (DuckDB's map type
    * is not needed to check the semantics).
    */
  private val mapFuncs = Q(
    (s, dir) =>
      T(s, dir, "events")
        .withColumn("m", map(
          lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast("string")))
        .select(
          col("event_id"),
          concat_ws(",", sort_array(map_keys(col("m")))).as("ks"),
          element_at(col("m"), "uid").as("uid_val"),
          element_at(col("m"), "type").as("type_val"),
          size(col("m")).as("m_size"),
          expr("map_contains_key(m, 'type')").as("has_type"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  'type,uid' AS ks,
           |  cast(user_id as varchar) AS uid_val,
           |  event_type AS type_val,
           |  2 AS m_size,
           |  true AS has_type
           |FROM events ORDER BY event_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Hash / misc
  // ---------------------------------------------------------------------

  private val hashFuncs = Q(
    (s, dir) =>
      T(s, dir, "customer")
        .select(
          col("c_custkey"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"),
          length(sha2(col("c_name"), 512)).as("sha512_len"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
           |  md5(c_name) AS h_md5,
           |  sha256(c_name) AS h_sha256,
           |  128 AS sha512_len
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Engine-specific hashes (Murmur3 `hash`, xxhash64, crc32) over FIXED
    * literal inputs: these functions are engine-defined constants
    * (murmur3/xxhash64 with Spark's seed 42, crc32 the standard CRC-32),
    * so the oracle is a VALUES table of the precomputed expected outputs
    * — any drift in the hash implementations fails the diff.
    */
  private val hashNativeExpected: Seq[(String, Int, Long, Long)] = Seq(
    ("graft-0", -1592366997, -7835119488856756382L, 2055429426L),
    ("graft-1", 1038620961, 7102959927320239621L, 226782628L),
    ("graft-10", -1570895796, 2238623588376838517L, 627915965L),
    ("graft-11", -727160484, 424227208350747673L, 1382681643L),
    ("graft-12", -892246512, 429255895881561712L, 3412286865L),
    ("graft-13", -104349288, 9181921749108905697L, 3160698119L),
    ("graft-14", 463122767, 776446359865308072L, 570488996L),
    ("graft-15", 1514612813, 5234462199020564003L, 1426573362L),
    ("graft-16", -1819026951, 7780851527999636184L, 3423508872L),
    ("graft-17", -874298776, -2593535962045967086L, 3137972510L),
    ("graft-18", 1161458590, 1881161838968013074L, 733394063L),
    ("graft-19", 470314846, 971618954918877898L, 1555137561L),
    ("graft-2", -1922056779, -3197053065351944897L, 2492283934L),
    ("graft-3", 87857088, 1561785834903755147L, 3817475208L),
    ("graft-4", -1161439238, 1720231960346561339L, 2112788779L),
    ("graft-5", -562641184, 7190316962624289293L, 183085501L),
    ("graft-6", 779562745, -8597478234818142024L, 2480994311L),
    ("graft-7", 1398680492, 4827471647138713585L, 3840395409L),
    ("graft-8", 1141105083, 1881574347965829537L, 1951978752L),
    ("graft-9", -556659899, 3543547549409846155L, 56616342L))

  private val hashSparkNative = Q(
    (s, dir) => {
      import s.implicits._
      (0 until 20).map(i => s"graft-$i").toDF("sval")
        .select(
          col("sval"),
          hash(col("sval")).as("h_murmur3"),
          xxhash64(col("sval")).as("h_xx64"),
          crc32(col("sval").cast("binary")).as("h_crc32"))
        .orderBy(col("sval"))
    },
    Some {
      val rows = hashNativeExpected
        .map { case (sv, m, x, c) => s"('$sv', $m, $x, $c)" }
        .mkString(",\n  ")
      s"""SELECT sval, h_murmur3, h_xx64, h_crc32 FROM (VALUES
         |  $rows) t(sval, h_murmur3, h_xx64, h_crc32)
         |ORDER BY sval""".stripMargin
    })

  // ---------------------------------------------------------------------
  // Conversion (base64 / hex / casts — the rpc `sn` analog,
  // /root/reference/src/processor.ts:108)
  // ---------------------------------------------------------------------

  private val conversionFuncs = Q(
    (s, dir) =>
      T(s, dir, "customer")
        .withColumn("bin", col("c_name").cast("binary"))
        .select(
          col("c_custkey"),
          base64(col("bin")).as("b64"),
          decode(unbase64(base64(col("bin"))), "UTF-8").as("b64_rt"),
          lower(hex(col("bin"))).as("hx"),
          decode(unhex(hex(col("bin"))), "UTF-8").as("hex_rt"),
          col("c_custkey").cast("string").as("key_str"),
          col("c_custkey").cast("string").cast("long").as("key_rt"),
          col("c_acctbal").cast("decimal(18,2)").cast("string").as("bal_str"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
           |  to_base64(encode(c_name)) AS b64,
           |  decode(from_base64(to_base64(encode(c_name)))) AS b64_rt,
           |  lower(hex(c_name)) AS hx,
           |  decode(unhex(hex(c_name))) AS hex_rt,
           |  cast(c_custkey as varchar) AS key_str,
           |  cast(cast(c_custkey as varchar) as bigint) AS key_rt,
           |  cast(cast(c_acctbal as decimal(18,2)) as varchar) AS bal_str
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Error-tolerant casts (try_cast), interval arithmetic, null-skipping
    * aggregate semantics, and regexp_extract_all — the edge-case corner
    * of the scalar surface.
    */
  private val edgeCases = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .withColumn("maybe_int",
          when(col("o_orderkey") % 3 === 0, concat(lit("x"), col("o_orderkey")))
            .otherwise(col("o_orderkey").cast("string")))
        .withColumn("nullable_price",
          when(col("o_orderstatus") === "P", lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .select(
          col("o_orderkey"),
          expr("try_cast(maybe_int as bigint)").as("tried_int"),
          expr("try_cast(o_orderpriority as date)").as("tried_date"),
          (col("o_orderdate") + expr("INTERVAL 90 MINUTE")).as("plus90m"),
          (col("o_orderdate") - expr("INTERVAL 2 DAY")).as("minus2d"),
          // array -> CSV string: the driver's checker pandas-sorts by all
          // columns and a list cell crashes it (unhashable ndarray).
          concat_ws(",", expr("regexp_extract_all(o_orderpriority, '([0-9]+)', 1)"))
            .as("prio_nums"),
          col("nullable_price").cast("decimal(18,4)").cast("double").as("np_dec"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |  try_cast(CASE WHEN o_orderkey % 3 = 0 THEN 'x' || cast(o_orderkey as varchar)
           |                ELSE cast(o_orderkey as varchar) END as bigint) AS tried_int,
           |  try_cast(o_orderpriority as date) AS tried_date,
           |  o_orderdate + INTERVAL 90 MINUTE AS plus90m,
           |  o_orderdate - INTERVAL 2 DAY AS minus2d,
           |  array_to_string(regexp_extract_all(o_orderpriority, '[0-9]+'), ',') AS prio_nums,
           |  cast(cast(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END
           |       as decimal(18,4)) as double) AS np_dec
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Null-skipping aggregate semantics over an induced-null column:
    * count/sum/avg/min/max ignore nulls; count(*) does not.
    */
  private val nullAggSemantics = Q(
    (s, dir) =>
      T(s, dir, "orders")
        .withColumn("v",
          when(col("o_orderstatus") === "P", lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
             count(col("v")).as("n_vals"),
             dsum(col("v"), "sum_v"),
             min(col("v").cast("decimal(18,4)")).cast("double").as("min_v"),
             max(col("v").cast("decimal(18,4)")).cast("double").as("max_v"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, count(*) AS n_rows,
           |  count(v) AS n_vals,
           |  cast(sum(cast(v as decimal(18,4))) as double) AS sum_v,
           |  cast(min(cast(v as decimal(18,4))) as double) AS min_v,
           |  cast(max(cast(v as decimal(18,4))) as double) AS max_v
           |FROM (SELECT o_orderstatus,
           |        CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v
           |      FROM orders)
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** Bitwise family over integer keys (AND / OR / XOR / shifts /
    * popcount / bit probe) — the ops behind bitmap indexes, bucket
    * masks, and the engine's own LSH signatures. All exact integer;
    * every output cast to bigint on both sides so the driver's
    * type-tagged compare sees identical reprs.
    */
  private val bitwiseFuncs = Q(
    (s, dir) =>
      Q.T(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(255)).cast("bigint").as("b_and"),
          (col("o_orderkey").bitwiseOR(4096)).cast("bigint").as("b_or"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).cast("bigint").as("b_xor"),
          expr("shiftleft(o_orderkey, 3)").cast("bigint").as("b_shl"),
          expr("shiftright(o_orderkey, 2)").cast("bigint").as("b_shr"),
          expr("bit_count(o_orderkey)").cast("bigint").as("b_pop"),
          expr("getbit(o_orderkey, 5)").cast("bigint").as("b_bit5"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |  cast(o_orderkey & 255 as bigint) AS b_and,
           |  cast(o_orderkey | 4096 as bigint) AS b_or,
           |  cast(xor(o_orderkey, o_custkey) as bigint) AS b_xor,
           |  cast(o_orderkey << 3 as bigint) AS b_shl,
           |  cast(o_orderkey >> 2 as bigint) AS b_shr,
           |  cast(bit_count(o_orderkey) as bigint) AS b_pop,
           |  cast((o_orderkey >> 5) & 1 as bigint) AS b_bit5
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Boolean aggregates (bool_and / bool_or / count_if) per group — the
    * "does every / any row satisfy P" reductions (data-quality
    * assertions, partition-level invariant checks).
    */
  private val boolAggs = Q(
    (s, dir) =>
      Q.T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
          count_if(col("o_orderstatus") === "F").as("n_f"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |  bool_and(o_totalprice > 1000) AS all_over_1k,
           |  bool_or(o_totalprice > 400000) AS any_over_400k,
           |  cast(count_if(o_orderstatus = 'F') as bigint) AS n_f,
           |  count(*) AS n
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  val all: Map[String, Q] = Map(
    "scalar_bitwise" -> bitwiseFuncs,
    "agg_boolean_logic" -> boolAggs,
    "scalar_edge_cases" -> edgeCases,
    "agg_null_semantics" -> nullAggSemantics,
    "scalar_string_funcs" -> stringFuncs,
    "scalar_string_funcs2" -> stringFuncs2,
    "scalar_datetime_funcs" -> datetimeFuncs,
    "scalar_datetime_funcs2" -> datetimeFuncs2,
    "scalar_math_funcs" -> mathFuncs,
    "scalar_array_hof" -> arrayHofFuncs,
    "scalar_map_funcs" -> mapFuncs,
    "scalar_hash_funcs" -> hashFuncs,
    "scalar_hash_spark_native" -> hashSparkNative,
    "scalar_conversion" -> conversionFuncs
  )
}
