package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventPipelines

/** Streaming throughput benchmark — the number the reference category
  * ("stream-processor") is judged on. Replays the events table through a
  * file source into the watermarked tumbling aggregation + dedup pipeline
  * and reports end-to-end events/second over the full drain.
  *
  * (The reference processes one JSON event per asyncio callback in one
  * Python process — 10^3–10^4 ev/s class; micro-batched columnar
  * execution is 10^5–10^6 ev/s class on the same box.)
  *
  * Run: sbt "runMain graft.StreamBench [sfDir]" (env SPARK_GRAFT_CPUS)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_sbench")
      .toString
    val srcDir = s"$tmp/src"
    EventPipelines.replayPrep(spark, sfDir, srcDir, files = 16)
    val nEvents = spark.read.parquet(srcDir).count()

    // warm codegen paths
    spark.range(100000L).selectExpr("sum(id)").collect()

    // best-of-2 with fresh checkpoints: the first drain pays one-time
    // streaming codegen/state-store initialization, the second measures
    // steady-state capacity
    def drain(name: String)(mk: => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { i =>
        val t0 = System.nanoTime()
        val q = mk.writeStream.format("noop")
          .option("checkpointLocation", s"$tmp/ckpt_${name}_$i")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }.min

    def src = EventPipelines.source(spark, srcDir, maxFilesPerTrigger = 16)
    val tTumble = drain("tumble")(EventPipelines.tumbling(src))
    val tDedup = drain("dedup")(EventPipelines.dedup(src))
    val tSession = drain("session")(EventPipelines.session(src))

    // near-dup ingestion capacity (round 7): the full banded-signature →
    // bucket-state → exact-verify pipeline over the documents table,
    // replayed as a 16-file stream — docs/s, not events/s (a doc costs
    // one shingle+MinHash pass, ~100× an event's window upsert)
    val docSrcDir = s"$tmp/docsrc"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.repartition(16).write.mode("overwrite").parquet(docSrcDir)
    val nDocs = docs.count()
    val docStore = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val tNearDup = drain("neardup")(
      graft.streaming.NearDupStream.nearDupPairsStream(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "16").parquet(docSrcDir),
        docStore))

    def rate(t: Double): Long = (nEvents / t).toLong
    println(s"""{"metric":"stream_events_per_sec","events":$nEvents,""" +
      s""""tumbling":${rate(tTumble)},"dedup":${rate(tDedup)},""" +
      s""""session":${rate(tSession)},""" +
      s""""neardup_docs_per_sec":${(nDocs / tNearDup).toLong},""" +
      s""""secs":{"tumbling":$tTumble,"dedup":$tDedup,""" +
      s""""session":$tSession,"neardup":$tNearDup}}""")
    spark.stop()
  }
}
