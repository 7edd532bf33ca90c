package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout tools for shuffle elimination at scale.
  *
  * The single biggest lever for a 100 TB fact⋈fact workload is not doing
  * the shuffle at all: write both tables bucketed by the join key and the
  * sort-merge join reads co-located buckets with NO exchange on either
  * side (and no sort, when also sorted by the key). These helpers wrap
  * the catalog round trip; the SkewSpec/LayoutSpec tests assert the
  * exchange-free plan.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back through the catalog (bucket metadata only
    * survives the catalog path — a raw path read loses it). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Co-located join of two same-bucketed tables on their bucket key:
    * plans as SortMergeJoin with zero Exchange when bucket counts match. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = readBucketed(spark, leftTable)
    val r = readBucketed(spark, rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
