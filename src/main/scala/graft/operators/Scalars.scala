package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._

/** Factory-rule queries (the reference's transform surface, R5/R7–R13) and
  * the scalar function catalog (string / date / math / array / json).
  *
  * All of these are single-pass narrow projections: no shuffle, fully
  * whole-stage-codegen'd, filters and projections push to the parquet scan.
  * They scale linearly with input splits on any cluster size.
  */
object Scalars {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- filters / predicates (trigger match + condition eval) ---------
    "q_filter_predicate" -> ((s, d) => {
      val pred = ConditionDsl.compile(
        "event_type = 'purchase' AND value > 100",
        scala.collection.Set("event_type", "value"))
      t(s, d, "events")
        .filter(pred)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy(asc_nulls_last("event_id"))
    }),

    "q_condition_block" -> ((s, d) => {
      val rules = Seq(CondBlock(
        branches = Seq(
          "value < 50" -> Seq(Set("band", lit("low"))),
          "value < 200" -> Seq(Set("band", lit("mid")))),
        otherwise = Seq(Set("band", lit("high")))))
      Converter(t(s, d, "events"), rules)
        .select("event_id", "value", "band")
        .orderBy(asc_nulls_last("event_id"))
    }),

    // ---- factory rules -------------------------------------------------
    "q_regex_extract" -> ((s, d) =>
      Converter(t(s, d, "part"), Seq(
        Extract("brand_num", "p_brand", "Brand#(\\d+)", 1)))
        .select("p_partkey", "p_brand", "brand_num")
        .orderBy(asc_nulls_last("p_partkey"))),

    "q_regex_sub" -> ((s, d) =>
      Converter(t(s, d, "part"), Seq(
        Set("name_novowel", col("p_name")),
        Sub("name_novowel", "[aeiou]", "")))
        .select("p_partkey", "p_name", "name_novowel")
        .orderBy(asc_nulls_last("p_partkey"))),

    "q_set_unset_lookup" -> ((s, d) =>
      Converter(t(s, d, "events"), Seq(
        Set("source_sys", lit("bus")),
        Unset("props"),
        Lookup("type_code", "event_type", Map(
          "click" -> lit(1L), "view" -> lit(2L), "purchase" -> lit(3L),
          "signup" -> lit(4L), "error" -> lit(5L)), lit(0L))))
        .select("event_id", "event_type", "type_code", "source_sys")
        .orderBy(asc_nulls_last("event_id"))),

    // ---- scalar function catalog ---------------------------------------
    "q_string_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        trim(lower(col("p_type"))).as("type_lc"))
        .orderBy(asc_nulls_last("p_partkey"))),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"),
          to_timestamp(lit("1995-01-01 00:00:00"))).cast("long")
          .as("days_since_95"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"))
        .orderBy(asc_nulls_last("o_orderkey"))),

    "q_math_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        abs(col("p_retailprice") - lit(1000.0)).as("price_dev"),
        sqrt(col("p_size")).as("size_sqrt"),
        round(log(col("p_retailprice")), 6).as("price_ln"),
        pow(col("p_size"), 2).as("size_sq"))
        .orderBy(asc_nulls_last("p_partkey"))),

    "q_array_funcs" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        // serialized scalar (driver's checker can't sort array cells)
        graft.Det.arrCsv("slice(embedding, 1, 3)").as("head3"),
        // Exact decimal fold: order-insensitive, hash-identical to the
        // DuckDB list_sum-over-decimals mirror (see graft.Det).
        // float → DOUBLE (exact widening) before the decimal cast: DuckDB's
        // direct FLOAT→DECIMAL cast rounds in float precision and diverges.
        expr("CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,7)), " +
          "(acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) " +
          "AS DECIMAL(28,7))) AS DOUBLE)").as("sum_vals"))
        .orderBy(asc_nulls_last("vec_id"))),

    "q_json_funcs" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy(asc_nulls_last("event_id")))
  )

  val oracle: Map[String, String] = Map(
    "q_filter_predicate" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'purchase' AND value > 100
        |ORDER BY event_id ASC NULLS LAST""".stripMargin,

    "q_condition_block" ->
      """SELECT event_id, value,
        |  CASE WHEN value < 50 THEN 'low'
        |       WHEN value < 200 THEN 'mid'
        |       ELSE 'high' END AS band
        |FROM events ORDER BY event_id ASC NULLS LAST""".stripMargin,

    "q_regex_extract" ->
      """SELECT p_partkey, p_brand,
        |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num
        |FROM part ORDER BY p_partkey ASC NULLS LAST""".stripMargin,

    "q_regex_sub" ->
      """SELECT p_partkey, p_name,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
        |FROM part ORDER BY p_partkey ASC NULLS LAST""".stripMargin,

    "q_set_unset_lookup" ->
      """SELECT event_id, event_type,
        |  CAST(CASE event_type
        |    WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
        |    WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE 0 END AS BIGINT)
        |    AS type_code,
        |  'bus' AS source_sys
        |FROM events ORDER BY event_id ASC NULLS LAST""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_up,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '-' || p_type AS brand_type,
        |  trim(lower(p_type)) AS type_lc
        |FROM part ORDER BY p_partkey ASC NULLS LAST""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
        |    AS days_since_95,
        |  o_orderdate + INTERVAL 30 DAY AS due_ts
        |FROM orders ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS price_r1,
        |  abs(p_retailprice - 1000.0) AS price_dev,
        |  sqrt(p_size) AS size_sqrt,
        |  round(ln(p_retailprice), 6) AS price_ln,
        |  pow(p_size, 2) AS size_sq
        |FROM part ORDER BY p_partkey ASC NULLS LAST""".stripMargin,

    "q_array_funcs" ->
      s"""SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  ${graft.Det.sqlArrCsv("list_slice(embedding, 1, 3)")} AS head3,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)))) AS DOUBLE)
        |    AS sum_vals
        |FROM embeddings ORDER BY vec_id ASC NULLS LAST""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id ASC NULLS LAST""".stripMargin
  )
}
