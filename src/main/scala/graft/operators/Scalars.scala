package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Scalar-function surface: date (X1, `Gddp.scala:108-112,125-129`), string
  * (X2, `Gddp.scala:108,114`), math (X3, `Gddp.scala:30`), JSON (request
  * parsing, `main.py:21-24`) and array functions (coord arrays §1.4). All are
  * codegen'd builtins — no UDFs — so they stay inside WholeStageCodegen.
  */
object Scalars extends QueryModule {

  /** X1: parse/extract/format/arithmetic on dates. */
  private def qDatefuncs(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        datediff(lit("1996-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_1996"))
      .orderBy("o_orderkey")

  /** X2: string manipulation. */
  private def qStrfuncs(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("tag"),
        substring(col("c_name"), 1, 8).as("pfx"),
        lower(col("c_mktsegment")).as("seg"))
      .orderBy("c_custkey")

  /** X3: math scalar functions (the squared-distance family of `Gddp.scala:30`). */
  private def qMathfuncs(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .select(col("c_custkey"),
        round(pow(col("c_acctbal"), 2), 4).as("sq"),
        round(abs(col("c_acctbal")), 2).as("ab"),
        round(sqrt(abs(col("c_acctbal"))), 4).as("rt"),
        round(abs(col("c_acctbal")) % 97.0d, 4).as("md"))
      .orderBy("c_custkey")

  /** JSON extraction from `events.props` (the engine-side form of the
    * reference's request-JSON parsing, `main.py:21-24`).
    */
  private def qJson(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** String-distance and transformation scalars (fuzzy matching is a staple
    * of entity-resolution / dedup pipelines).
    */
  private def qStrDistance(s: SparkSession, d: String): DataFrame =
    T.nation(s, d)
      .select(col("n_nationkey"),
        levenshtein(col("n_name"), lit("CANADA")).as("lev"),
        lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"),
        reverse(col("n_name")).as("rev"),
        translate(col("n_name"), "AEIOU", "aeiou").as("tr"))
      .orderBy("n_nationkey")

  /** Regex extraction (group 1 digits out of the props JSON string) — kept to
    * POSIX-compatible pattern syntax so Java and RE2-family engines agree.
    */
  private def qRegexp(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("props"), "[0-9]", "#").as("masked"))
      .orderBy("event_id")

  /** Map functions (§2B array/map row): build a map per event, then read it
    * back through element_at / size / map_keys / transform_values. Outputs
    * are scalars (the driver's hash compare cannot digest map cells), and the
    * oracle states the expected values independently — checking the map ops'
    * semantics, not echoing them.
    */
  private def qMapFuncs(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast("string")).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "type").as("etype"),
        size(col("m")).as("msize"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
        element_at(transform_values(col("m"), (_, v) => upper(v)), "type").as("etype_up"))
      .orderBy("event_id")

  private def dsum(c: Column): Column =
    aggregate(c, lit(0.0d), (acc, x) => acc + x.cast("double"))

  /** Array functions over `embeddings.embedding` (float elements are cast to
    * double before summation so the fold matches the oracle bit-for-bit).
    */
  private def qArray(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(dsum(col("embedding")), 4).as("vsum"),
        round(array_max(col("embedding")).cast("double"), 4).as("vmax"),
        round(array_min(col("embedding")).cast("double"), 4).as("vmin"))
      .orderBy("vec_id")

  /** array_contains as a predicate over tokenized text. */
  private def qArrayContains(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .groupBy("source")
      .agg(sum(when(array_contains(split(col("text"), " "), "spark"), 1).otherwise(0))
        .as("docs_with_spark"), count(lit(1)).as("n_docs"))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_contains" -> qArrayContains,
    "q_datefuncs" -> qDatefuncs,
    "q_strfuncs" -> qStrfuncs,
    "q_mathfuncs" -> qMathfuncs,
    "q_json" -> qJson,
    "q_regexp" -> qRegexp,
    "q_str_distance" -> qStrDistance,
    "q_map_funcs" -> qMapFuncs,
    "q_array" -> qArray
  )

  val oracleSql: Map[String, String] = Map(
    "q_array_contains" ->
      """SELECT source,
        |  CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'spark')
        |               THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_spark,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_datefuncs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dy,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INT) AS days_to_1996
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_strfuncs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS tag,
        |  substr(c_name, 1, 8) AS pfx,
        |  lower(c_mktsegment) AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_mathfuncs" ->
      """SELECT c_custkey,
        |  round(pow(c_acctbal, 2), 4) AS sq,
        |  round(abs(c_acctbal), 2) AS ab,
        |  round(sqrt(abs(c_acctbal)), 4) AS rt,
        |  round(fmod(abs(c_acctbal), 97.0), 4) AS md
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_regexp" ->
      """SELECT event_id,
        |  regexp_extract(props, '([0-9]+)', 1) AS digits,
        |  regexp_replace(props, '[0-9]', '#', 'g') AS masked
        |FROM events ORDER BY event_id""".stripMargin,
    "q_str_distance" ->
      """SELECT n_nationkey,
        |  CAST(levenshtein(n_name, 'CANADA') AS INT) AS lev,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
        |  reverse(n_name) AS rev,
        |  translate(n_name, 'AEIOU', 'aeiou') AS tr
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // independent statement of what the map round-trip must produce
    "q_map_funcs" ->
      """SELECT event_id,
        |  event_type AS etype,
        |  2 AS msize,
        |  'type,uid' AS keys,
        |  upper(event_type) AS etype_up
        |FROM events ORDER BY event_id""".stripMargin,
    "q_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vsum,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax,
        |  round(CAST(list_min(embedding) AS DOUBLE), 4) AS vmin
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
