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

  test("factory task reaches every Rules.scala rule type from template " +
      "JSON: extract, sub, set, unset, lookup, condition_block") {
    val tpl =
      """{
        |  "id": "all-rules", "tasks": [
        |    {"id": "f", "name": "factory", "config": {"rules": [
        |      {"type": "extract", "dst": "digits", "src": "props",
        |       "pattern": "(\\d+)", "group": 1},
        |      {"type": "sub", "field": "event_type",
        |       "pattern": "^pur.*", "replacement": "BUY"},
        |      {"type": "set", "field": "source", "value": "bus"},
        |      {"type": "unset", "field": "props"},
        |      {"type": "lookup", "dst": "type_code", "src": "event_type",
        |       "table": {"BUY": "1", "click": "2"}, "default": "0"},
        |      {"type": "condition_block", "branches": [
        |        {"condition": "value < 50",
        |         "set": [{"field": "band", "value": "low"}]}],
        |       "otherwise": [{"field": "band", "value": "high"}]}
        |    ]}},
        |    {"id": "sel", "name": "select",
        |     "config": {"columns": ["event_id", "event_type", "digits",
        |       "source", "type_code", "band"]}}
        |  ],
        |  "graph": {"f": ["sel"]}
        |}""".stripMargin
    val src = Seq(
      (1L, "purchase", 30.0, "{\"k\": 87}"),
      (2L, "click", 90.0, "{\"k\": 5}"))
      .toDF("event_id", "event_type", "value", "props")
    val rows = TemplateCompiler.compileJson(tpl, src)
      .orderBy("event_id").collect()
    assert(rows.map(_.schema.fieldNames.toSeq).head ==
      Seq("event_id", "event_type", "digits", "source", "type_code", "band"))
    assert(rows(0).getString(1) == "BUY") // sub rewrote purchase
    assert(rows(0).getString(2) == "87") // extract from props
    assert(rows(0).getString(3) == "bus") // set
    assert(rows(0).getString(4) == "1") // lookup via rewritten key
    assert(rows(0).getString(5) == "low") // condition_block branch
    assert(rows(1).getString(4) == "2" && rows(1).getString(5) == "high")
  }

  test("join task equi-joins heterogeneous fan-in branches on the key") {
    val tpl =
      """{
        |  "id": "keyed-fanin", "tasks": [
        |    {"id": "a", "name": "aggregate",
        |     "config": {"group_by": ["user_id"],
        |       "aggs": [{"fn": "count", "as": "n"}]}},
        |    {"id": "b", "name": "aggregate",
        |     "config": {"group_by": ["user_id"],
        |       "aggs": [{"fn": "max", "col": "value", "as": "mx"}]}},
        |    {"id": "j", "name": "join",
        |     "config": {"on": ["user_id"], "how": "inner"}}
        |  ],
        |  "graph": {"a": ["j"], "b": ["j"]}
        |}""".stripMargin
    val src = Seq((1L, 10.0), (1L, 30.0), (2L, 5.0))
      .toDF("user_id", "value")
    val out = TemplateCompiler.compileJson(tpl, src)
    assert(out.columns.toSeq == Seq("user_id", "n", "mx"))
    val m = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L) == ((2L, 30.0)) && m(2L) == ((1L, 5.0)))
    // equi-join stays hash/merge-plannable — never a nested loop
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin")
      && !phys.contains("CartesianProduct"))
  }

  test("inline trigger_workflow sub-template fuses into the parent plan") {
    val tpl =
      """{
        |  "id": "outer", "tasks": [
        |    {"id": "t", "name": "trigger_filter",
        |     "config": {"condition": "value >= 10"}},
        |    {"id": "sub", "name": "trigger_workflow", "config": {
        |      "template": {"id": "inner", "tasks": [
        |        {"id": "f", "name": "factory", "config": {"rules": [
        |          {"type": "set", "field": "tag", "value": "inner"}]}},
        |        {"id": "agg", "name": "aggregate",
        |         "config": {"group_by": ["tag"],
        |           "aggs": [{"fn": "count", "as": "n"}]}}],
        |        "graph": {"f": ["agg"]}}}}
        |  ],
        |  "graph": {"t": ["sub"]}
        |}""".stripMargin
    val src = Seq((1L, 5.0), (2L, 10.0), (3L, 50.0))
      .toDF("event_id", "value")
    val out = TemplateCompiler.compileJson(tpl, src)
    // capture BEFORE executing: after collect AQE prints Final+Initial
    // plans and every node would count twice
    val phys = out.queryExecution.executedPlan.toString
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "inner" && rows(0).getLong(1) == 2L)
    // the sub-template's plan FUSED: one scan, no materialization seam
    assert("LocalTableScan|FileScan".r.findAllIn(phys).size == 1)
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
