package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup
import graft.streaming.EventPipelines

class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("LSH pipeline finds planted near-duplicates and skips distinct docs") {
    // plant near-dups: copies of fixture texts with one token appended
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").filter($"doc_id" < 40)
    val dups = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 1000).as("doc_id"),
        concat($"text", lit(" extra")).as("text"))
    val corpus = docs.union(dups)
    val found = TextDedup.nearDuplicates(corpus, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each planted pair (i, i+1000) must be found
    (0L until 10L).foreach(i =>
      assert(found.contains((i, i + 1000)), s"missed planted dup $i"))
    // every reported pair must truly have token-jaccard >= 0.7
    // (brute-force ground truth; fixture docs share a tiny vocabulary so
    // some organic pairs legitimately qualify too)
    val tokSets = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    found.foreach { case (a, b) =>
      val j = tokSets(a).intersect(tokSets(b)).size.toDouble /
        tokSets(a).union(tokSets(b)).size
      assert(j >= 0.7, s"pipeline reported ($a,$b) with true jaccard $j")
    }
  }

  test("exactDedup keeps lowest id per duplicate group") {
    val base = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").filter($"doc_id" < 20)
    val clones = base.select(($"doc_id" + 500).as("doc_id"), $"text")
    val out = TextDedup.exactDedup(base.union(clones))
    assert(out.count() == 20)
    assert(out.agg(max("doc_id")).head.getLong(0) < 500)
  }

  test("streaming checkpoint recovery: restart resumes without " +
      "reprocessing or loss") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val srcDir = s"$tmp/src"
    val outDir = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    EventPipelines.replayPrep(spark, sf, srcDir, files = 4)
    def runOnce(): Unit = {
      val q = EventPipelines.sink(
          EventPipelines.trigger(
            EventPipelines.source(spark, srcDir, maxFilesPerTrigger = 1),
            "purchase"),
          outDir, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // full drain
    val n1 = spark.read.parquet(outDir).count()
    runOnce() // restart from checkpoint: nothing new -> no duplicates
    val n2 = spark.read.parquet(outDir).count()
    assert(n1 == n2, s"restart duplicated output: $n1 -> $n2")
    val expected = Tables.table(spark, sf, "events")
      .filter($"event_type" === "purchase").count()
    assert(n1 == expected)
  }
}
