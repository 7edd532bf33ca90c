package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{TemplateCompiler, TemplateRegistry}
import graft.streaming.Monitoring

/** Control plane: template CRUD/versioning/publish (R17), trigger routing
  * (R3), sub-workflow inlining (R16), monitoring listener (R18), and the
  * opt-in deterministic-sum optimizer rule. */
class ControlPlaneSpec extends SparkSpec {
  import spark.implicits._

  private val child =
    """{"id": "band-only", "tasks": [
      |  {"id": "f", "name": "factory", "config": {"rules": [
      |     {"type": "condition_block", "branches": [
      |        {"condition": "value < 50",
      |         "set": [{"field": "band", "value": "low"}]}],
      |      "otherwise": [{"field": "band", "value": "high"}]}]}}],
      | "graph": {}}""".stripMargin

  private val parent =
    """{"id": "routed", "tasks": [
      |  {"id": "t", "name": "trigger_filter",
      |   "config": {"condition": "event_type = 'purchase'"}},
      |  {"id": "sub", "name": "trigger_workflow",
      |   "config": {"template_id": "band-only"}},
      |  {"id": "agg", "name": "aggregate",
      |   "config": {"group_by": ["band"],
      |     "aggs": [{"fn": "count", "as": "n"}]}}],
      | "graph": {"t": ["sub"], "sub": ["agg"]}}""".stripMargin

  test("registry CRUD + versioning + publish lifecycle") {
    val reg = new TemplateRegistry
    reg.put(child, version = 1)
    assert(reg.get("band-only", 1).isDefined)
    assert(reg.latestPublished("band-only").isEmpty) // still draft
    reg.publish("band-only", 1)
    assert(reg.latestPublished("band-only").contains(1))
    reg.put(child, version = 2)
    reg.publish("band-only", 2)
    assert(reg.latestPublished("band-only").contains(2))
    reg.delete("band-only", 2)
    assert(reg.latestPublished("band-only").contains(1))
  }

  test("upsert validation rejects bad templates") {
    val reg = new TemplateRegistry
    intercept[IllegalArgumentException](reg.put(
      """{"id": "bad", "tasks": [
        |  {"id": "a", "name": "nonsense_task", "config": {}}],
        | "graph": {}}""".stripMargin, 1))
    intercept[IllegalArgumentException](reg.put(
      """{"id": "cyc", "tasks": [
        |  {"id": "a", "name": "sleep", "config": {}},
        |  {"id": "b", "name": "sleep", "config": {}}],
        | "graph": {"a": ["b"], "b": ["a"]}}""".stripMargin, 1))
  }

  test("upsert rejects function-calling conditions and multi-sink graphs") {
    val reg = new TemplateRegistry
    // java_method smuggled into a condition_block branch fails at put()
    intercept[IllegalArgumentException](reg.put(
      """{"id": "evil", "tasks": [
        |  {"id": "f", "name": "factory", "config": {"rules": [
        |     {"type": "condition_block", "branches": [
        |        {"condition": "java_method('java.lang.System', 'exit')",
        |         "set": [{"field": "x", "value": "y"}]}],
        |      "otherwise": []}]}}],
        | "graph": {}}""".stripMargin, 1))
    // trigger_filter conditions get the same schema-independent gate
    intercept[IllegalArgumentException](reg.put(
      """{"id": "evil2", "tasks": [
        |  {"id": "t", "name": "trigger_filter",
        |   "config": {"condition": "rand() > 0.5"}}],
        | "graph": {}}""".stripMargin, 1))
    // two sinks fail at put(), not later inside compile() at fire() time
    intercept[IllegalArgumentException](reg.put(
      """{"id": "twosink", "tasks": [
        |  {"id": "a", "name": "sleep", "config": {}},
        |  {"id": "b", "name": "sleep", "config": {}}],
        | "graph": {}}""".stripMargin, 1))
  }

  test("sub-workflow inlines into one plan and trigger routing fires") {
    val reg = new TemplateRegistry
    reg.put(child, 1); reg.publish("band-only", 1)
    reg.put(parent, 1); reg.publish("routed", 1)
    reg.setTrigger("purchase", "routed", 1)
    val events = Tables.table(spark, sf, "events")
    val out = reg.fire("purchase", events).get
    // one scan: the sub-template fused into the same Catalyst plan
    val physical = out.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(physical).size == 1)
    val expect = events.filter($"event_type" === "purchase")
      .withColumn("band", when($"value" < 50, "low").otherwise("high"))
      .groupBy("band").count()
    val j = out.join(expect, "band")
    assert(j.filter($"n" =!= $"count").count() == 0
      && j.count() == out.count())
    assert(reg.fire("unknown_type", events).isEmpty)
  }

  test("per-task timeout cancels a runaway action and spares a fast one") {
    import graft.plans.TaskTimeout
    // runaway: per-row sleeps make the job outlast the timeout by far
    val slowUdf = udf((x: Long) => { Thread.sleep(200); x })
    val t0 = System.nanoTime()
    intercept[TaskTimeout.TaskTimedOutException] {
      TaskTimeout.runWithTimeout(spark, s"slow_${System.nanoTime()}", 1500) {
        // aggregate over the UDF output — a bare count() would prune the
        // column away and never run the sleeps
        spark.range(0, 1000, 1, 4).select(slowUdf(col("id")).as("x"))
          .agg(sum("x")).collect()
      }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 30.0, s"cancellation must be prompt, took $elapsed s")
    // fast action under the same wrapper completes untouched
    val n = TaskTimeout.runWithTimeout(
      spark, s"fast_${System.nanoTime()}", 60000) {
      spark.range(100).count()
    }
    assert(n == 100)
    // the session stays healthy after a cancellation
    assert(spark.range(10).count() == 10)
  }

  test("monitoring listener captures per-batch reports (R18)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mon = new Monitoring().attach(spark)
    try {
      val mem = MemoryStream[Long]
      mem.addData(1L to 100L: _*)
      val q = mem.toDS().toDF("v")
        .groupBy().count()
        .writeStream.format("memory")
        .queryName(s"mon_${System.nanoTime()}")
        .outputMode("complete").start()
      q.processAllAvailable()
      // listener events arrive async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (mon.reports(q.id.toString).isEmpty
          && System.nanoTime() < deadline) Thread.sleep(50)
      val reps = mon.reports(q.id.toString)
      q.stop()
      assert(reps.nonEmpty)
      assert(reps.map(_.numInputRows).sum == 100)
      assert(mon.activeQueryIds.contains(q.id.toString))
      assert(mon.failures.isEmpty)
    } finally mon.detach(spark)
  }

  test("deterministic-sum rule makes sum(double) partition-invariant " +
      "and equal to the explicit decimal form") {
    // Extensions only apply at session CREATION, and the conf-based form
    // (spark.sql.extensions) is STATIC — ignored once a SparkContext
    // exists. withExtensions() applies programmatically either way; clear
    // the fixture session so the builder makes a genuinely new one
    // (sharing the JVM-wide SparkContext).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-detsum")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val li = s2.read.parquet(s"$sf/lineitem.parquet")
        .select("l_extendedprice")
      s2.conf.set("spark.graft.deterministicSum", "true")
      val a = li.repartition(1).agg(sum("l_extendedprice")).head.getDouble(0)
      val b = li.repartition(32).agg(sum("l_extendedprice")).head.getDouble(0)
      assert(a == b, "decimal-rewritten sums must be partition-invariant")
      val explicitDec = li.agg(
        sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double"))
        .head.getDouble(0)
      assert(a == explicitDec)
      // operators ABOVE the rewritten aggregate must still bind to its
      // output (regression: the rule once re-aliased with a fresh exprId)
      val filtered = li.groupBy()
        .agg(sum("l_extendedprice").as("s"))
        .filter(col("s") > 0).orderBy(col("s"))
        .head.getDouble(0)
      assert(filtered == a)
      s2.conf.set("spark.graft.deterministicSum", "false")
      val plain = li.agg(sum("l_extendedprice")).queryExecution
        .optimizedPlan.toString
      assert(!plain.contains("decimal(38,6)"),
        "rule must be inert when disabled")
    } finally {
      // do not stop s2 (it shares the JVM-wide SparkContext) — clear the
      // flag and restore the fixture session as active/default
      s2.conf.set("spark.graft.deterministicSum", "false")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
