package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Weighted-mean buffer: exact decimal partial sums, so merge order
  * (partitions, AQE, speculative retries) cannot change the result. */
case class WMeanBuf(wsum: JBigDecimal, wtot: JBigDecimal)

/** Typed `Aggregator`: weight-averaged price. Each addend is rounded to
  * scale 6 exactly like a SQL `CAST(x AS DECIMAL(18,6))` (round-to-nearest
  * of the binary double; exact ties are not representable, so rounding-
  * mode differences can never fire) — making the result hash-identical to
  * the DuckDB oracle. */
class WeightedMean extends Aggregator[(Double, Double), WMeanBuf, Double] {
  private def d6(x: Double): JBigDecimal =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP)
  override def zero: WMeanBuf = WMeanBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)
  override def reduce(b: WMeanBuf, in: (Double, Double)): WMeanBuf = {
    val (price, weight) = in
    WMeanBuf(b.wsum.add(d6(price * weight)), b.wtot.add(d6(weight)))
  }
  override def merge(a: WMeanBuf, b: WMeanBuf): WMeanBuf =
    WMeanBuf(a.wsum.add(b.wsum), a.wtot.add(b.wtot))
  override def finish(b: WMeanBuf): Double =
    if (b.wtot.signum == 0) Double.NaN
    else b.wsum.doubleValue / b.wtot.doubleValue
  override def bufferEncoder: Encoder[WMeanBuf] = Encoders.product[WMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** User-extension surface: Scala UDF, typed Aggregator UDAF, generator
  * (UDTF-shaped posexplode). UDFs stay deterministic and single-pass;
  * where a built-in exists it is preferred (codegen) — these queries
  * exist to pin the extension API itself. */
object Custom {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scala" -> ((s, d) => {
      val netCharge = udf((p: Double, disc: Double, tax: Double) =>
        p * (1.0 - disc) * (1.0 + tax))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          netCharge(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("net_charge"))
        .orderBy(asc_nulls_last("l_orderkey"), asc_nulls_last("l_linenumber"),
          asc_nulls_last("net_charge"))
    }),

    "q_udaf_weighted" -> ((s, d) => {
      val wavg = udaf(new WeightedMean(),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity"))
          .as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_last("l_returnflag"))
    }),

    "q_udtf_explode" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast("long"))
        .select("doc_id", "pos", "token")
        .orderBy(asc_nulls_last("doc_id"), asc_nulls_last("pos")))
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scala" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_charge
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST,
        |  net_charge ASC NULLS LAST""".stripMargin,

    "q_udaf_weighted" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)))
        |      AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    AS wavg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin,

    "q_udtf_explode" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 20
        |), s AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks
        |  FROM t
        |)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM s ORDER BY doc_id ASC NULLS LAST, pos ASC NULLS LAST"""
        .stripMargin
  )
}
