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

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(inputBytes / targetFileBytes) files. Streaming sinks and
    * per-trigger micro-batches leave thousands of KB-sized files; at
    * 100 TB the NameNode/listing and per-file open costs dominate reads
    * long before the data does. Uses coalesce (no shuffle) when shrinking
    * the file count — the rewrite is one narrow pass. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val path = new org.apache.hadoop.fs.Path(inPath)
    // resolve the filesystem FROM the path: FileSystem.get(conf) returns
    // the default FS and throws "Wrong FS" for any other scheme
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(path).getLength
    val files = math.max(1, math.ceil(
      inputBytes.toDouble / targetFileBytes).toInt)
    val in = spark.read.parquet(inPath)
    // coalesce only shrinks; growing the file count needs a real shuffle
    val sized = if (files <= in.rdd.getNumPartitions) in.coalesce(files)
                else in.repartition(files)
    sized.write.mode("overwrite").parquet(outPath)
  }
}
