package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{FloatDot, GraftFunctions}
import graft.sources.Sources

class FunctionsAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("float_dot native expression matches a hand computation") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(expr("float_dot(a, b)")).head.getDouble(0)
    assert(got == 32.0)
  }

  test("float_dot survives whole-stage codegen over real embeddings and " +
      "agrees with the interpreted path") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.table(spark, sf, "embeddings").limit(50)
    val pairs = e.select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(e.select($"vec_id".as("ib"), $"embedding".as("eb")))
    val viaCodegen = pairs.select($"ia", $"ib",
      expr("float_dot(ea, eb)").as("d")).collect()
    viaCodegen.take(20).foreach { r =>
      val row = pairs.filter($"ia" === r.getLong(0) && $"ib" === r.getLong(1))
        .head
      val a = row.getSeq[Float](1)
      val b = row.getSeq[Float](3)
      var s = 0.0
      a.indices.foreach(i => s += a(i).toDouble * b(i).toDouble)
      assert(r.getDouble(2) == s)
    }
  }

  test("float_dot is null-safe and handles length mismatch") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]),
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(2.0f))))
      .toDF("a", "b")
    val out = df.select(expr("float_dot(a, b)")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 2.0)
  }

  test("json-lines round trip (bus-payload shape) batch and stream") {
    val dir = Files.createTempDirectory("graft_json").toString
    val events = Tables.table(spark, sf, "events").limit(100)
    Sources.writeJsonLines(events, s"$dir/out")
    val schema = events.schema
    val back = Sources.jsonLines(spark, s"$dir/out", schema)
    assert(back.count() == 100)
    // streaming read of the same directory drains to the same count
    val sink = s"jsrt_${System.nanoTime()}"
    val q = Sources.jsonStream(spark, s"$dir/out", schema, 8)
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(sink).count() == 100)
  }

  test("csv round trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val nation = Tables.table(spark, sf, "nation")
    Sources.writeCsv(nation, s"$dir/out")
    val back = Sources.csv(spark, s"$dir/out", nation.schema)
    assert(back.count() == 25)
    assert(back.schema == nation.schema)
  }
}
