package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.Det
import graft.functions._

/** Workflow-template compiler: the reference's workflow engine executes a
  * JSON template — `{id, tasks: [{id, name, config}], graph: {parent:
  * [children]}}` — as an interpreted DAG, one task coroutine per event
  * (public reference: tukio `workflow.py`/`dag.py`, `nyuki/workflow/`;
  * mount empty, see SURVEY.md §0).
  *
  * Here the SAME template shape compiles to ONE composed DataFrame program
  * — i.e. one Catalyst plan. Spark then does what the reference's asyncio
  * loop did (schedule the DAG) but whole-dataset, whole-stage-codegen'd and
  * distributed: an arbitrarily long task chain costs a single pass over
  * the data, and fan-in tasks become unions/joins planned together with
  * everything else.
  *
  * Supported task names (ref task modules in parentheses):
  *  - `trigger_filter` — config `{condition}`, the trigger/condition DSL
  *    (engine trigger match + `utils/evaluate.py`);
  *  - `factory` — config `{rules: [...]}` ordered rule list
  *    (`tasks/factory.py` + `utils/transform.py`);
  *  - `select` — config `{columns: [...]}` projection;
  *  - `aggregate` — config `{group_by: [...], aggs: [{fn, col, as}]}`
  *    with fn ∈ count|dsum|min|max (partial-agg friendly);
  *  - `union` — fan-in of all parent branches (`tasks/join.py`);
  *  - `join` — keyed fan-in: config `{on: [...], how}` equi-join of the
  *    parent branches (`tasks/join.py` for heterogeneous branches);
  *  - `trigger_workflow` — config `{template_id, version?}` or
  *    `{template}`: the sub-template's compiled plan inlines into THIS
  *    plan (R16, `tasks/trigger_workflow.py`);
  *  - `sleep` — no-op in batch compile (`tasks/sleep.py`);
  *  - `report` — no-op marker; streaming sinks attach here
  *    (`tasks/report.py`).
  */
object TemplateCompiler {

  final case class Task(id: String, name: String, config: JValue)
  final case class Template(id: String, tasks: Seq[Task],
      graph: Map[String, Seq[String]])

  def parse(json: String): Template = {
    implicit val fmts: Formats = DefaultFormats
    val jv = JsonMethods.parse(json)
    val tasks = (jv \ "tasks").children.map { t =>
      Task((t \ "id").extract[String], (t \ "name").extract[String],
        t \ "config")
    }
    val graph = (jv \ "graph") match {
      case JObject(fields) =>
        fields.map { case (k, v) =>
          k -> v.children.map(_.extract[String])
        }.toMap
      case _ => Map.empty[String, Seq[String]]
    }
    Template((jv \ "id").extract[String], tasks, graph)
  }

  /** All condition-DSL strings a task's config carries (trigger_filter
    * condition, factory condition_block branch conditions) — so the
    * registry can syntax-check every expression-bearing config field at
    * upsert. Any future task that embeds conditions must be added here. */
  def conditionStrings(task: Task): Seq[String] = {
    implicit val fmts: Formats = DefaultFormats
    task.name match {
      case "trigger_filter" =>
        (task.config \ "condition").extractOpt[String].toSeq
      case "factory" =>
        (task.config \ "rules").children.flatMap { r =>
          if ((r \ "type").extractOpt[String].contains("condition_block"))
            (r \ "branches").children
              .flatMap(b => (b \ "condition").extractOpt[String])
          else Nil
        }
      case _ => Nil
    }
  }

  /** Kahn topological order; throws on cycles. Shared by the compiler and
    * the registry's upsert validation (the reference validates on upsert). */
  def topoOrder(template: Template): Seq[String] = {
    val parents: Map[String, Seq[String]] = {
      val m = scala.collection.mutable.Map.empty[String, Vector[String]]
      template.tasks.foreach(t => m(t.id) = Vector.empty)
      template.graph.foreach { case (p, cs) =>
        cs.foreach(c => m(c) = m.getOrElse(c, Vector.empty) :+ p)
      }
      m.toMap
    }
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val indeg = scala.collection.mutable.Map(
      parents.view.mapValues(_.size).toSeq: _*)
    val queue = scala.collection.mutable.Queue(
      template.tasks.filter(t => indeg(t.id) == 0).map(_.id): _*)
    while (queue.nonEmpty) {
      val id = queue.dequeue(); order += id
      template.graph.getOrElse(id, Nil).foreach { c =>
        indeg(c) -= 1; if (indeg(c) == 0) queue.enqueue(c)
      }
    }
    if (order.size != template.tasks.size)
      throw new IllegalArgumentException(
        s"template ${template.id}: task graph has a cycle")
    order.toSeq
  }

  /** Compile a template to a single DataFrame program rooted at `source`.
    * Tasks execute in topological order; fan-in tasks receive every parent
    * branch; `trigger_workflow` tasks inline the referenced sub-template's
    * compiled plan (R16 — the reference spawns a nested workflow; here the
    * sub-plan fuses into the SAME Catalyst plan). The result is the output
    * of the (single) sink task. */
  def compile(template: Template, source: DataFrame,
      registry: TemplateRegistry = null): DataFrame = {
    val byId = template.tasks.map(t => t.id -> t).toMap
    val parents: Map[String, Seq[String]] = {
      val m = scala.collection.mutable.Map.empty[String, Vector[String]]
      template.tasks.foreach(t => m(t.id) = Vector.empty)
      template.graph.foreach { case (p, cs) =>
        cs.foreach(c => m(c) = m.getOrElse(c, Vector.empty) :+ p)
      }
      m.toMap
    }
    val order = topoOrder(template)
    val out = scala.collection.mutable.Map.empty[String, DataFrame]
    order.foreach { id =>
      val task = byId(id)
      val ins = parents(id) match {
        case Seq() => Seq(source)
        case ps    => ps.map(out)
      }
      out(id) = applyTask(task, ins, registry)
    }
    val sinks = template.tasks.map(_.id)
      .filter(id => template.graph.getOrElse(id, Nil).isEmpty)
    require(sinks.size == 1,
      s"template ${template.id}: expected exactly one sink task, got $sinks")
    out(sinks.head)
  }

  def compileJson(json: String, source: DataFrame,
      registry: TemplateRegistry = null): DataFrame =
    compile(parse(json), source, registry)

  private def applyTask(task: Task, inputs: Seq[DataFrame],
      registry: TemplateRegistry): DataFrame = {
    implicit val fmts: Formats = DefaultFormats
    task.name match {
      case "trigger_filter" =>
        val cond = (task.config \ "condition").extract[String]
        val df = inputs.head
        df.filter(ConditionDsl.compile(cond, df.columns.toSet))
      case "factory" =>
        Converter(inputs.head, (task.config \ "rules").children.map(parseRule))
      case "select" =>
        val cols = (task.config \ "columns").children.map(_.extract[String])
        inputs.head.select(cols.map(col): _*)
      case "aggregate" =>
        val groupCols = (task.config \ "group_by").children
          .map(_.extract[String])
        val aggs = (task.config \ "aggs").children.map { a =>
          val fn = (a \ "fn").extract[String]
          val alias = (a \ "as").extract[String]
          val c = (a \ "col").extractOpt[String].map(col).getOrElse(lit(1))
          (fn match {
            case "count" => count(lit(1))
            case "dsum"  => Det.dsum(c)
            case "min"   => min(c)
            case "max"   => max(c)
            case other   => throw new IllegalArgumentException(
              s"unsupported agg fn: $other")
          }).as(alias)
        }
        inputs.head.groupBy(groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
      case "union" =>
        inputs.reduce(_ unionByName _)
      case "join" =>
        // keyed fan-in (R6 `tasks/join.py` when branches carry different
        // columns for the same entity): equi-join all parent branches on
        // the configured key columns — equi keys keep the plan a
        // hash/merge join (broadcast- and shuffle-plannable), never a
        // nested loop. `how` defaults to inner; all parents after the
        // first must bring only NEW non-key columns (Spark rejects
        // ambiguous duplicates at analysis otherwise).
        require(inputs.size >= 2,
          s"join task '${task.id}' needs >= 2 parent branches")
        val on = (task.config \ "on").children.map(_.extract[String])
        require(on.nonEmpty, s"join task '${task.id}' needs join keys")
        val how = (task.config \ "how").extractOpt[String]
          .getOrElse("inner")
        inputs.reduce((l, r) => l.join(r, on, how))
      case "trigger_workflow" =>
        // Sub-workflow (R16): resolve by id (published-latest unless a
        // version is pinned) or take an inline template; the sub-plan
        // inlines into this plan — Catalyst optimizes across the boundary.
        (task.config \ "template_id").extractOpt[String] match {
          case Some(id) =>
            require(registry != null,
              s"trigger_workflow '$id' needs a TemplateRegistry")
            val sub = registry.resolve(id,
              (task.config \ "version").extractOpt[Int])
            compile(sub, inputs.head, registry)
          case None =>
            val inline = (task.config \ "template")
            require(inline != JNothing,
              "trigger_workflow needs template_id or an inline template")
            compile(parse(JsonMethods.compact(
              JsonMethods.render(inline))), inputs.head, registry)
        }
      case "sleep" | "report" =>
        inputs.head
      case other =>
        throw new IllegalArgumentException(s"unsupported task: $other")
    }
  }

  private def parseRule(jv: JValue): Rule = {
    implicit val fmts: Formats = DefaultFormats
    def str(f: String) = (jv \ f).extract[String]
    (jv \ "type").extract[String] match {
      case "extract" => Extract(str("dst"), str("src"), str("pattern"),
        (jv \ "group").extractOpt[Int].getOrElse(1))
      case "sub"     => Sub(str("field"), str("pattern"), str("replacement"))
      case "set"     => Set(str("field"), jv \ "value" match {
        case JString(v) => lit(v)
        case JInt(v)    => lit(v.toLong)
        case JDouble(v) => lit(v)
        case JBool(v)   => lit(v)
        case other      => throw new IllegalArgumentException(
          s"unsupported set value: $other")
      })
      case "unset"   => Unset(str("field"))
      case "lookup"  =>
        val table = (jv \ "table") match {
          case JObject(fields) => fields.map { case (k, v) =>
            k -> (lit(v.extract[String]): Column)
          }.toMap
          case _ => Map.empty[String, Column]
        }
        Lookup(str("dst"), str("src"), table, lit(str("default")))
      case "condition_block" =>
        val branches = (jv \ "branches").children.map { b =>
          val cond = (b \ "condition").extract[String]
          val sets = (b \ "set").children.map(sv =>
            Set((sv \ "field").extract[String], sv \ "value" match {
              case JString(v) => lit(v)
              case JInt(v)    => lit(v.toLong)
              case JDouble(v) => lit(v)
              case other      => throw new IllegalArgumentException(
                s"unsupported set value: $other")
            }))
          // Raw string: CondBlock routes it through ConditionDsl.compile
          // against the in-scope columns when the rule is applied, so
          // template JSON cannot inject arbitrary SQL expressions.
          (cond, sets)
        }
        val otherwise = (jv \ "otherwise").children.map(sv =>
          Set((sv \ "field").extract[String], sv \ "value" match {
            case JString(v) => lit(v)
            case JInt(v)    => lit(v.toLong)
            case JDouble(v) => lit(v)
            case other      => throw new IllegalArgumentException(
              s"unsupported set value: $other")
          }))
        CondBlock(branches, otherwise)
      case other =>
        throw new IllegalArgumentException(s"unsupported rule: $other")
    }
  }
}

/** Declared query exercising the whole compiler path end-to-end: a
  * nyuki-shaped JSON template (trigger → factory rules → aggregate)
  * compiled onto the events table as one Catalyst plan. */
object TemplateQueries {
  import org.apache.spark.sql.SparkSession

  val purchaseRollupTemplate: String =
    """{
      |  "id": "purchase-rollup", "version": 1,
      |  "tasks": [
      |    {"id": "t1", "name": "trigger_filter",
      |     "config": {"condition": "event_type = 'purchase'"}},
      |    {"id": "t2", "name": "factory", "config": {"rules": [
      |       {"type": "condition_block", "branches": [
      |          {"condition": "value < 50",
      |           "set": [{"field": "band", "value": "low"}]},
      |          {"condition": "value < 200",
      |           "set": [{"field": "band", "value": "mid"}]}],
      |        "otherwise": [{"field": "band", "value": "high"}]},
      |       {"type": "set", "field": "pipeline", "value": "bus"},
      |       {"type": "unset", "field": "props"}]}},
      |    {"id": "t3", "name": "aggregate",
      |     "config": {"group_by": ["band"], "aggs": [
      |        {"fn": "count", "as": "n"},
      |        {"fn": "dsum", "col": "value", "as": "sum_value"}]}}
      |  ],
      |  "graph": {"t1": ["t2"], "t2": ["t3"]}
      |}""".stripMargin

  /** The wildcard-routing panel: overlapping MQTT filters over the
    * synthetic event topic `app/<event_type>/u<user_id%10>`, including
    * one filter that matches nothing (the left join keeps its zero
    * row) and the catch-alls. ONE definition — the Spark side and the
    * oracle both consume [[TopicMatch.toRegex]] of these. */
  val wildcardPanel: Seq[String] = Seq(
    "app/#", "app/+/+", "app/+/u3", "app/purchase/#",
    "app/view/u7", "web/#")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_template_pipeline" -> ((s, d) =>
      TemplateCompiler.compileJson(purchaseRollupTemplate,
          graft.Tables.table(s, d, "events"))
        .orderBy(asc_nulls_last("band"))),

    // Trigger routing with MQTT wildcards (R3): every event maps to a
    // topic, every panel filter counts the events it would route plus
    // the distinct users and value mass behind them. The panel side is
    // a 6-row broadcast literal, so the regexp join is a bounded
    // nested-loop over a fixed panel (the PlanRegressionSpec BNLJ
    // allowlist shape) — per event the work is 6 codegen'd anchored
    // regex probes, embarrassingly parallel and shuffle-free until the
    // 6-group aggregate. At 100 TB the same plan holds: the panel is
    // subscription metadata (KBs), never data-sized.
    "q_trigger_wildcard" -> ((s, d) => {
      import s.implicits._
      val pats = TemplateQueries.wildcardPanel
        .map(p => (p, TopicMatch.toRegex(p))).toDF("pattern", "rx")
      val ev = graft.Tables.table(s, d, "events")
        .select(concat(lit("app/"), col("event_type"), lit("/u"),
            (col("user_id") % 10).cast("string")).as("topic"),
          col("user_id"), col("value"))
      // r13 optimization audit: A/B'd a literal-pattern rlike dispatch
      // (CASE per panel entry) against this generic `topic rlike rx`
      // join — timing-NEUTRAL (exec 1.27 vs 1.28 s solo sf0.1), because
      // RLike caches the last compiled pattern and the BNLJ loop keeps
      // the pattern constant per inner pass, so the column-pattern form
      // compiles each regex only once per stream row. Kept the simpler
      // generic form; the remaining cost is the countDistinct expand +
      // exact-decimal sum over the matched pairs, which IS the query.
      broadcast(pats)
        .join(ev, expr("topic rlike rx"), "left")
        .groupBy("pattern")
        .agg(count(col("topic")).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Det.dsum(col("value")).as("sum_value"))
        .orderBy(asc_nulls_last("pattern"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_template_pipeline" ->
      s"""SELECT CASE WHEN value < 50 THEN 'low'
         |       WHEN value < 200 THEN 'mid' ELSE 'high' END AS band,
         |  COUNT(*) AS n, ${Det.sqlDsum("value")} AS sum_value
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY band ASC NULLS LAST""".stripMargin,

    "q_trigger_wildcard" -> {
      val rows = wildcardPanel
        .map(p => s"('${p}', '${TopicMatch.toRegex(p)}')")
        .mkString(", ")
      s"""WITH pats AS (
         |  SELECT * FROM (VALUES $rows) p(pattern, rx)
         |), ev AS (
         |  SELECT 'app/' || event_type || '/u'
         |      || CAST(user_id % 10 AS VARCHAR) AS topic,
         |    user_id, value
         |  FROM events
         |)
         |SELECT p.pattern, COUNT(e.topic) AS n_events,
         |  COUNT(DISTINCT e.user_id) AS n_users,
         |  ${Det.sqlDsum("e.value")} AS sum_value
         |FROM pats p LEFT JOIN ev e ON regexp_matches(e.topic, p.rx)
         |GROUP BY p.pattern
         |ORDER BY p.pattern ASC NULLS LAST""".stripMargin
    }
  )
}
