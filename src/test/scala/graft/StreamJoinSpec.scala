package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventPipelines

case class LeftEv(user: Long, lts: Timestamp, amount: Double)
case class RightEv(r_user: Long, rts: Timestamp, source: String)

/** Stream⋈stream interval join and the mid-DAG report sink (R15). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => Timestamp.valueOf(s)

  test("watermarked stream-stream join pairs events within the window " +
      "and matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[LeftEv]
    val rm = MemoryStream[RightEv]
    lm.addData(
      LeftEv(1, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(1, ts("2024-01-01 12:00:00"), 70.0),
      LeftEv(2, ts("2024-01-01 10:30:00"), 90.0))
    rm.addData(
      RightEv(1, ts("2024-01-01 09:30:00"), "ad"),   // within 1h of 10:00
      RightEv(1, ts("2024-01-01 11:30:00"), "mail"), // within 1h of 12:00
      RightEv(2, ts("2024-01-01 08:00:00"), "ad"))   // too old for 10:30
    val name = s"ssj_${System.nanoTime()}"
    val q = EventPipelines.streamStreamJoin(
        lm.toDF(), rm.toDF(), "user")
      .select("user", "lts", "amount", "rts", "source")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name)
      .orderBy("user", "lts", "rts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), "ad"),
      (1L, ts("2024-01-01 12:00:00"), "mail"),
      ))
    // batch twin agrees
    val lb = Seq(LeftEv(1, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(1, ts("2024-01-01 12:00:00"), 70.0),
      LeftEv(2, ts("2024-01-01 10:30:00"), 90.0)).toDF()
    val rb = Seq(RightEv(1, ts("2024-01-01 09:30:00"), "ad"),
      RightEv(1, ts("2024-01-01 11:30:00"), "mail"),
      RightEv(2, ts("2024-01-01 08:00:00"), "ad")).toDF()
    val batch = lb.join(rb, lb("user") === rb("r_user")
        && rb("rts") <= lb("lts")
        && rb("rts") >= lb("lts") - expr("INTERVAL 1 hour"))
      .count()
    assert(batch == got.size)
  }

  test("watermarked LEFT OUTER stream-stream join emits unmatched lefts " +
      "as nulls once the watermark passes, matching the batch left join") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[LeftEv]
    val rm = MemoryStream[RightEv]
    val name = s"ssoj_${System.nanoTime()}"
    val q = EventPipelines.streamStreamJoin(
        lm.toDF(), rm.toDF(), "user", joinType = "left_outer")
      .select("user", "lts", "amount", "rts", "source")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: user 1 matches, user 2 has no view in-window
    lm.addData(
      LeftEv(1, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(2, ts("2024-01-01 10:30:00"), 90.0))
    rm.addData(
      RightEv(1, ts("2024-01-01 09:30:00"), "ad"),
      RightEv(2, ts("2024-01-01 08:00:00"), "ad")) // too old for 10:30
    q.processAllAvailable()
    // batch 2: far-future events push BOTH watermarks a day forward, so
    // user 2's unmatched row is provably final and must flush as nulls
    lm.addData(LeftEv(99, ts("2024-01-02 23:00:00"), 1.0))
    rm.addData(RightEv(99, ts("2024-01-02 23:00:00"), "late"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
      .filter(col("user") < 99)
      .orderBy("user", "lts")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(4)))).toSeq
    assert(got == Seq((1L, Some("ad")), (2L, None)))
    // batch twin agrees on the same input
    val lb = Seq(LeftEv(1, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(2, ts("2024-01-01 10:30:00"), 90.0)).toDF()
    val rb = Seq(RightEv(1, ts("2024-01-01 09:30:00"), "ad"),
      RightEv(2, ts("2024-01-01 08:00:00"), "ad")).toDF()
    val batch = lb.join(rb, lb("user") === rb("r_user")
        && rb("rts") <= lb("lts")
        && rb("rts") >= lb("lts") - expr("INTERVAL 1 hour"), "left_outer")
      .select(lb("user"), rb("source"))
      .orderBy("user").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(batch == got)
  }

  test("stream-static broadcast enrichment matches the batch twin " +
      "row for row") {
    implicit val sqlCtx = spark.sqlContext
    val nation = Tables.table(spark, sf, "nation")
    val mem = MemoryStream[LeftEv]
    val evs = Seq(
      LeftEv(3, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(28, ts("2024-01-01 11:00:00"), 60.0), // 28 % 25 = key 3 too
      LeftEv(7, ts("2024-01-01 12:00:00"), 70.0))
    mem.addData(evs: _*)
    val name = s"ssenr_${System.nanoTime()}"
    // same builder as the declared batch query, driven by a stream: the
    // static side needs no watermark and holds no state
    val q = graft.operators.StreamShapes.staticEnrich(
        mem.toDF().withColumnRenamed("user", "user_id"), nation)
      .select("user_id", "amount", "n_name")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    val batch = graft.operators.StreamShapes.staticEnrich(
        evs.toDF().withColumnRenamed("user", "user_id"), nation)
      .select("user_id", "n_name").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == batch && got.size == 3)
    // users 3 and 28 land on the same nation key (mod-25 fold)
    val byUser = got.toMap
    assert(byUser(3L) == byUser(28L))
  }

  test("report sink publishes both main and side outputs per batch (R15)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LeftEv]
    mem.addData(LeftEv(1, ts("2024-01-01 10:00:00"), 50.0),
      LeftEv(2, ts("2024-01-01 10:05:00"), 150.0))
    val q = EventPipelines.withReportSink(
        mem.toDF(), s"$tmp/main", s"$tmp/report", s"$tmp/ckpt",
        report = b => b.filter(col("amount") > 100))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$tmp/main/batch=0").count() == 2)
    assert(spark.read.parquet(s"$tmp/report/batch=0").count() == 1)
  }
}
