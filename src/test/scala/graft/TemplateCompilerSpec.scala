package graft

import org.apache.spark.sql.functions._

import graft.plans.{TemplateCompiler, TemplateQueries}

class TemplateCompilerSpec extends SparkSpec {
  import spark.implicits._

  test("parses a nyuki-shaped template") {
    val t = TemplateCompiler.parse(TemplateQueries.purchaseRollupTemplate)
    assert(t.id == "purchase-rollup")
    assert(t.tasks.map(_.name) ==
      Seq("trigger_filter", "factory", "aggregate"))
    assert(t.graph("t1") == Seq("t2"))
  }

  test("compiles a chain to one plan with correct results") {
    val out = TemplateQueries.queries("q_template_pipeline")(spark, sf)
    val expect = Tables.table(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .withColumn("band", when($"value" < 50, "low")
        .when($"value" < 200, "mid").otherwise("high"))
      .groupBy("band").count()
      .withColumnRenamed("count", "n")
    val j = out.join(expect, "band")
    assert(j.count() == out.count())
    assert(j.filter(out("n") =!= expect("n")).count() == 0)
  }

  test("fan-in union task merges branches") {
    val tpl =
      """{
        |  "id": "fanin", "tasks": [
        |    {"id": "a", "name": "trigger_filter",
        |     "config": {"condition": "event_type = 'click'"}},
        |    {"id": "b", "name": "trigger_filter",
        |     "config": {"condition": "event_type = 'view'"}},
        |    {"id": "u", "name": "union", "config": {}},
        |    {"id": "agg", "name": "aggregate",
        |     "config": {"group_by": ["event_type"],
        |       "aggs": [{"fn": "count", "as": "n"}]}}
        |  ],
        |  "graph": {"a": ["u"], "b": ["u"], "u": ["agg"]}
        |}""".stripMargin
    val src = Tables.table(spark, sf, "events")
    val out = TemplateCompiler.compileJson(tpl, src)
    val types = out.select("event_type").collect().map(_.getString(0)).toSet
    assert(types == Set("click", "view"))
  }

  test("rejects a cyclic graph") {
    val tpl =
      """{"id": "cyc", "tasks": [
        |  {"id": "a", "name": "sleep", "config": {}},
        |  {"id": "b", "name": "sleep", "config": {}}],
        | "graph": {"a": ["b"], "b": ["a"]}}""".stripMargin
    val src = Tables.table(spark, sf, "events")
    intercept[IllegalArgumentException](
      TemplateCompiler.compileJson(tpl, src))
  }

  test("template chain collapses into a single optimized plan " +
      "(no intermediate materialization)") {
    val out = TemplateQueries.queries("q_template_pipeline")(spark, sf)
    val physical = out.queryExecution.executedPlan.toString
    // one scan of events; filter pushed to the scan
    assert("FileScan parquet".r.findAllIn(physical).size == 1)
  }
}
