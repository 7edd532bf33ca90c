package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Factory-rule layer: the reference's per-event field-transform rules
  * re-expressed as Spark Column combinators (SURVEY.md §2.1 R5, R7–R13;
  * public reference paths `nyuki/utils/transform.py`,
  * `nyuki/workflow/tasks/factory.py` — mount empty, see SURVEY.md §0).
  *
  * The reference interprets an ordered rule list per event dict, one event
  * at a time. Here a rule list compiles to a chain of narrow projections on
  * a DataFrame — Catalyst collapses the whole chain into a single
  * whole-stage-codegen'd projection, so an arbitrarily long converter runs
  * at full columnar scan speed with zero shuffles, at any scale.
  */
sealed trait Rule

/** Regex with a capture group over `src` → new field `dst` (ref rule
  * "extract"). */
final case class Extract(dst: String, src: String, pattern: String,
    group: Int = 1) extends Rule

/** Regex substitution on a field in place (ref rule "sub"). */
final case class Sub(field: String, pattern: String, replacement: String)
  extends Rule

/** Set a field to a constant / arbitrary Column (ref rule "set"). */
final case class Set(field: String, value: Column) extends Rule

/** Delete a field (ref rule "unset"). */
final case class Unset(field: String) extends Rule

/** Map a field through a value→value table into `dst` (ref rule "lookup").
  * Small inline maps compile to a codegen'd CASE WHEN chain; large lookup
  * tables should be a `broadcast()` join instead. */
final case class Lookup(dst: String, src: String,
    table: Map[String, Column], default: Column) extends Rule

/** if / elif / else over row predicates; each branch contributes `Set`
  * rules (ref "condition-block" + `nyuki/utils/evaluate.py` conditions).
  * Conditions are DSL STRINGS, compiled through [[ConditionDsl]] against
  * the frame's columns when the rule is applied — template JSON (untrusted
  * control-plane input) can therefore never smuggle arbitrary SQL
  * expressions (`java_method`, non-deterministic functions, …) into a
  * plan; the same sandbox the reference enforces with its whitelisted
  * condition AST. Compiles to per-field `when()` chains — one codegen'd
  * expression, no branching in the plan. */
final case class CondBlock(branches: Seq[(String, Seq[Set])],
    otherwise: Seq[Set]) extends Rule

object Converter {

  /** Apply an ordered rule list — the reference's "converter" — to a
    * DataFrame as one chained (and Catalyst-collapsed) projection. */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df)(applyRule)

  private def applyRule(df: DataFrame, rule: Rule): DataFrame = rule match {
    case Extract(dst, src, pattern, group) =>
      df.withColumn(dst, regexp_extract(col(src), pattern, group))
    case Sub(field, pattern, replacement) =>
      df.withColumn(field, regexp_replace(col(field), pattern, replacement))
    case Set(field, value) =>
      df.withColumn(field, value)
    case Unset(field) =>
      df.drop(field)
    case Lookup(dst, src, table, default) =>
      val chain = table.toSeq.sortBy(_._1).foldLeft[Option[Column]](None) {
        case (acc, (k, v)) =>
          Some(acc.fold(when(col(src) === k, v))(_.when(col(src) === k, v)))
      }
      df.withColumn(dst, chain.fold(default)(_.otherwise(default)))
    case CondBlock(branches, otherwise) =>
      // True if/elif/else: exactly ONE branch (or the else) fires per row.
      // A single matched-branch index drives every field assignment, so a
      // branch that matches but does not set a field leaves it unchanged
      // (and suppresses the else), exactly like the reference's
      // interpreter. One codegen'd CASE per field, no plan branching.
      val fieldsInScope = df.columns.toSet
      val matchIdx = branches.zipWithIndex
        .foldLeft[Option[Column]](None) { case (acc, ((condStr, _), i)) =>
          val cond = ConditionDsl.compile(condStr, fieldsInScope)
          Some(acc.fold(when(cond, lit(i)))(_.when(cond, lit(i))))
        }.fold(lit(-1))(_.otherwise(lit(-1)))
      val tmp = "_graft_cond_branch"
      val withIdx = df.withColumn(tmp, matchIdx)
      val fields =
        (branches.flatMap(_._2) ++ otherwise).map(_.field).distinct
      val assigned = fields.foldLeft(withIdx) { (acc, f) =>
        val existing: Column =
          if (acc.columns.contains(f)) col(f) else lit(null)
        val branchChain = branches.zipWithIndex
          .foldLeft[Option[Column]](None) {
            case (acc2, ((_, sets), i)) =>
              sets.find(_.field == f).map { s =>
                acc2.fold(when(col(tmp) === i, s.value))(
                  _.when(col(tmp) === i, s.value))
              }.orElse(acc2)
          }
        val elseValue = otherwise.find(_.field == f).map(_.value)
        val withElse = elseValue match {
          case Some(v) => Some(branchChain
            .fold(when(col(tmp) === -1, v))(_.when(col(tmp) === -1, v)))
          case None => branchChain
        }
        acc.withColumn(f, withElse.fold(existing)(_.otherwise(existing)))
      }
      assigned.drop(tmp)
  }
}

/** Safe condition DSL (ref `nyuki/utils/evaluate.py`): the reference
  * whitelists an AST of comparisons / boolean ops / `in` / regex over event
  * fields. Here conditions compile to Catalyst via `expr()` after a token
  * whitelist check — the resulting predicate is codegen'd and pushable.
  */
object ConditionDsl {
  // Linear hand-rolled tokenizer, NOT one `(alt)+` regex: the regex form
  // backtracks exponentially on a long ident/number followed by a
  // disallowed char (measured 47 s at 28 chars) — a control-plane DoS
  // from untrusted template JSON.
  private val tokenPats: List[java.util.regex.Pattern] = List(
    """\s+""", "'[^']*'", """\d+(\.\d+)?""", "[a-zA-Z_][a-zA-Z0-9_.]*",
    """<=|>=|!=|[=<>+\-*/%(),]""").map(_.r.pattern)

  private def tokenizes(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      var next = -1
      val it = tokenPats.iterator
      while (next < 0 && it.hasNext) {
        val m = it.next().matcher(s)
        m.region(i, s.length)
        if (m.lookingAt()) next = m.end
      }
      if (next < 0) return false
      i = next
    }
    true
  }

  private val allowedWords =
    scala.collection.immutable.Set("and", "or", "not", "in", "is", "null",
      "true", "false", "rlike", "like", "between")

  /** Schema-independent syntax gate: token whitelist plus a structural
    * function-call guard (`ident(` is rejected unless `ident` is a grammar
    * word like IN). Runs at template UPSERT, where the event schema is not
    * yet known — so `java_method('…')`-style calls fail at put() like the
    * reference's AST validation, not at fire().
    *
    * Comment sequences and backslashes are rejected OUTRIGHT (even inside
    * string literals): Spark's lexer treats `/*…*/`, `--` and `\'` in
    * ways a string-level scanner cannot mirror, and a crafted
    * `/*'*/ … java_method(…)` comment desynchronizes literal stripping
    * enough to smuggle a call past both guards. None of the four have a
    * legitimate use in this DSL. */
  def validateSyntax(condition: String): Unit = {
    Seq("/*", "*/", "--", "\\").foreach { seq =>
      require(!condition.contains(seq),
        s"condition may not contain '$seq'")
    }
    require(tokenizes(condition),
      s"condition contains disallowed tokens: $condition")
    val noLiterals = condition.replaceAll("'[^']*'", " ")
    """([a-zA-Z_][a-zA-Z0-9_.]*)\s*\(""".r
      .findAllMatchIn(noLiterals).foreach { m =>
        require(allowedWords.contains(m.group(1).toLowerCase),
          s"condition may not call functions: ${m.group(1)}")
      }
  }

  /** Compile a whitelisted boolean expression over row fields. Rejects
    * anything but field refs, literals, comparisons, boolean connectives,
    * IN, LIKE and RLIKE (regex). */
  def compile(condition: String, fields: scala.collection.Set[String]): Column = {
    validateSyntax(condition)
    val noLiterals = condition.replaceAll("'[^']*'", " ")
    val idents = """[a-zA-Z_][a-zA-Z0-9_.]*""".r
      .findAllIn(noLiterals).map(_.toLowerCase).toSet
    val unknown = idents -- allowedWords -- fields.map(_.toLowerCase)
    require(unknown.isEmpty,
      s"condition references unknown identifiers: $unknown")
    expr(condition)
  }
}
