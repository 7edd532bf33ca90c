package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Template store + trigger routing — the reference's control plane
  * (REST CRUD of versioned workflow templates in MongoDB, draft→publish
  * lifecycle, DAG validation on upsert, topic→template triggers; public
  * reference `nyuki/workflow/workflow.py`, `nyuki/workflow/storage/`;
  * mount empty, SURVEY.md §0).
  *
  * Spark-native: templates are data (JSON), compiled plans are code —
  * the registry validates on upsert (acyclicity, task names, single sink)
  * by compiling against an empty frame, stores versions immutably, and
  * routes event-type triggers to compiled pipelines. No HTTP layer: the
  * harness is the API surface; any REST front end is a thin shim over
  * these five methods.
  */
final class TemplateRegistry {

  private case class Entry(template: TemplateCompiler.Template,
      json: String, draft: Boolean)

  private val store = TrieMap.empty[(String, Int), Entry]
  private val triggers = TrieMap.empty[String, (String, Int)]
  private val patternTriggers = TrieMap.empty[String, (String, Int)]

  /** Upsert a template version (draft by default). Validates structure by
    * parsing + topological check; throws on cycles/multiple sinks exactly
    * like the reference's upsert validation. */
  def put(json: String, version: Int, draft: Boolean = true): String = {
    val tpl = TemplateCompiler.parse(json)
    validate(tpl)
    store((tpl.id, version)) = Entry(tpl, json, draft)
    tpl.id
  }

  /** Publish flips the draft flag — published versions are what triggers
    * resolve against. CAS loop (r12): the naive get-then-put lost a
    * concurrent writer's `put` on the same (id, version) — publish
    * would resurrect the json it had read, silently merging two writes
    * into a state neither writer produced. With `replace` the flip
    * only lands on the exact entry it read; if a concurrent put wins,
    * publish retries against the NEW entry, so the final state is
    * always some writer's complete write (last-write-wins, never a
    * splice). ControlPlaneSpec races two writers to pin this. */
  def publish(id: String, version: Int): Unit = {
    var done = false
    while (!done) {
      val e = store.getOrElse((id, version),
        throw new NoSuchElementException(s"template $id v$version"))
      done = !e.draft ||
        store.replace((id, version), e, e.copy(draft = false))
    }
  }

  def get(id: String, version: Int): Option[String] =
    store.get((id, version)).map(_.json)

  def latestPublished(id: String): Option[Int] =
    store.collect { case ((i, v), e) if i == id && !e.draft => v }
      .maxOption

  def delete(id: String, version: Int): Unit = store.remove((id, version))

  /** Trigger mapping: event_type/topic → template (R3). */
  def setTrigger(eventType: String, id: String, version: Int): Unit = {
    require(store.contains((id, version)), s"unknown template $id v$version")
    triggers(eventType) = (id, version)
  }

  def getTrigger(eventType: String): Option[(String, Int)] =
    triggers.get(eventType)

  def deleteTrigger(eventType: String): Boolean =
    triggers.remove(eventType).isDefined

  def listTriggers: Seq[(String, String, Int)] =
    triggers.readOnlySnapshot().toSeq
      .map { case (et, (id, v)) => (et, id, v) }.sortBy(_._1)

  /** Wildcard trigger subscription (R3, the MQTT-filter half): an
    * MQTT 3.1.1 topic filter (`+`/`#`, [[TopicMatch]]) → template.
    * Unlike the exact map, SEVERAL filters may match one topic — a
    * published event fans out to every subscribed template, exactly
    * like overlapping bus subscriptions in the reference. The filter
    * is validated on subscribe (reject on write, not on fire). */
  def setTriggerPattern(pattern: String, id: String, version: Int): Unit = {
    TopicMatch.validate(pattern)
    require(store.contains((id, version)), s"unknown template $id v$version")
    patternTriggers(pattern) = (id, version)
  }

  def deleteTriggerPattern(pattern: String): Boolean =
    patternTriggers.remove(pattern).isDefined

  def listTriggerPatterns: Seq[(String, String, Int)] =
    patternTriggers.readOnlySnapshot().toSeq
      .map { case (p, (id, v)) => (p, id, v) }.sortBy(_._1)

  /** Compile the template a trigger routes to, rooted at `source` already
    * filtered to the triggering event type. */
  def fire(eventType: String, source: DataFrame): Option[DataFrame] =
    triggers.get(eventType).flatMap { case (id, v) =>
      store.get((id, v)).map(e =>
        TemplateCompiler.compile(e.template, source, this))
    }

  /** Route one concrete topic through the wildcard subscriptions: every
    * matching filter's template compiles against `source`, keyed by
    * (pattern, template id) so the caller sees WHY each plan fired.
    * Deterministic order (pattern asc) — fan-out must not depend on
    * map iteration. */
  def fireTopic(topic: String, source: DataFrame)
      : Seq[((String, String), DataFrame)] =
    patternTriggers.readOnlySnapshot().toSeq.sortBy(_._1)
      .filter { case (p, _) => TopicMatch.matches(topic, p) }
      .flatMap { case (p, (id, v)) =>
        store.get((id, v)).map(e =>
          (p, id) -> TemplateCompiler.compile(e.template, source, this))
      }

  /** Resolve for sub-workflow inlining (R16): published-latest unless an
    * exact version is requested. */
  private[plans] def resolve(id: String,
      version: Option[Int]): TemplateCompiler.Template = {
    val v = version.orElse(latestPublished(id)).getOrElse(
      throw new NoSuchElementException(s"no published version of $id"))
    store.getOrElse((id, v),
      throw new NoSuchElementException(s"template $id v$v")).template
  }

  /** Durable snapshot — templates + triggers to parquet under `dir`
    * (the reference's MongoDB template store mapped to the engine's own
    * storage layer; the no-HTTP descope leaves durability as the store's
    * remaining obligation). Overwrite-in-place: the snapshot IS the
    * store state, so replaying saveTo is idempotent. Deliberately tiny
    * frames (a registry holds workflow definitions, not data) — one
    * file each, no partitioning. */
  def saveTo(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    // The three maps snapshot at different instants, so a writer racing
    // the save can register a trigger whose template is missing from
    // the template snapshot — a torn save that loadFrom would then
    // reject wholesale (r12). Snapshot templates FIRST and filter both
    // trigger snapshots to keys that exist in it: the saved state is a
    // consistent point-in-time view (a trigger registered mid-save
    // simply waits for the next save), and every saveTo output is
    // loadable by construction. ControlPlaneSpec races a saver against
    // a writer to pin this.
    val tplSnap = store.readOnlySnapshot().toSeq
    val tplKeys = tplSnap.map(_._1).toSet
    tplSnap
      .map { case ((id, v), e) => (id, v, e.json, e.draft) }
      .toDF("id", "version", "json", "draft")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/templates")
    triggers.readOnlySnapshot().toSeq
      .filter { case (_, key) => tplKeys.contains(key) }
      .map { case (et, (id, v)) => (et, id, v) }
      .toDF("event_type", "id", "version")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/triggers")
    patternTriggers.readOnlySnapshot().toSeq
      .filter { case (_, key) => tplKeys.contains(key) }
      .map { case (p, (id, v)) => (p, id, v) }
      .toDF("pattern", "id", "version")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/trigger_patterns")
  }

  private def validate(tpl: TemplateCompiler.Template): Unit = {
    val names = tpl.tasks.map(_.name).toSet
    val known = Set("trigger_filter", "factory", "select", "aggregate",
      "union", "sleep", "report", "trigger_workflow")
    val bad = names -- known
    require(bad.isEmpty, s"unknown task names: $bad")
    val ids = tpl.tasks.map(_.id)
    require(ids.distinct.size == ids.size, "duplicate task ids")
    tpl.graph.foreach { case (p, cs) =>
      require(ids.contains(p), s"graph references unknown task $p")
      cs.foreach(c => require(ids.contains(c),
        s"graph references unknown task $c"))
    }
    // single sink: compile() would reject this too, but only at fire()
    // time — the reference rejects on upsert
    val sinks = ids.filter(id => tpl.graph.getOrElse(id, Nil).isEmpty)
    require(sinks.size == 1,
      s"template must have exactly one sink task, got $sinks")
    // every expression-bearing config string must pass the condition DSL's
    // schema-independent syntax gate (token whitelist, no function calls)
    // so a template cannot smuggle arbitrary SQL into a compiled plan
    tpl.tasks.flatMap(TemplateCompiler.conditionStrings)
      .foreach(graft.functions.ConditionDsl.validateSyntax)
    // acyclicity checked by the compiler's Kahn pass; run it eagerly here
    // so bad templates fail on upsert (ref behavior)
    TemplateCompiler.topoOrder(tpl)
  }
}

object TemplateRegistry {

  /** Rebuild a registry from a [[TemplateRegistry!.saveTo]] snapshot —
    * restart-survival for the control plane. Every stored template
    * re-enters through `put`, so a corrupted or hand-edited snapshot
    * fails the SAME upsert validation as a live put (never loads bad
    * state silently); triggers re-enter through `setTrigger` after all
    * templates exist, so dangling trigger rows fail loudly too. */
  def loadFrom(spark: SparkSession, dir: String): TemplateRegistry = {
    val r = new TemplateRegistry
    spark.read.parquet(s"$dir/templates")
      .select("json", "version", "draft").collect()
      .foreach(row => r.put(row.getAs[String]("json"),
        row.getAs[Int]("version"), row.getAs[Boolean]("draft")))
    spark.read.parquet(s"$dir/triggers")
      .select("event_type", "id", "version").collect()
      .foreach(row => r.setTrigger(row.getAs[String]("event_type"),
        row.getAs[String]("id"), row.getAs[Int]("version")))
    // pattern triggers: absent in pre-wildcard snapshots — a snapshot
    // written by an older registry must still load (forward-compatible
    // read of its own history, not silent tolerance of corruption: the
    // rows that DO exist still go through setTriggerPattern validation)
    val pdir = new java.io.File(s"$dir/trigger_patterns")
    if (pdir.exists)
      spark.read.parquet(s"$dir/trigger_patterns")
        .select("pattern", "id", "version").collect()
        .foreach(row => r.setTriggerPattern(row.getAs[String]("pattern"),
          row.getAs[String]("id"), row.getAs[Int]("version")))
    r
  }
}
