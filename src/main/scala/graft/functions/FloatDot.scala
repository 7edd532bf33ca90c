package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * This is the "custom Catalyst Expression" tier of the extension ladder
  * (compose built-ins → custom Expression → custom plan/strategy): the
  * built-in higher-order functions evaluate a lambda per element through
  * the interpreter, and a Scala UDF pays serialization at every call; this
  * expression generates a tight Java loop inside whole-stage codegen —
  * the hot path for brute-force similarity screening at scale.
  *
  * Double arithmetic in ascending index order — deterministic for a given
  * pair, independent of partitioning. (Final oracle-grade rankings still
  * go through the exact-decimal fold; this is the screening kernel.)
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Engine function catalog: registration for custom expressions, both as
  * a [[org.apache.spark.sql.SparkSessionExtensions]] installer (cluster
  * deployment: `spark.sql.extensions=graft.functions.GraftExtensions`)
  * and as an idempotent per-session registrar (works on any session the
  * harness hands us). */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))),
    (new FunctionIdentifier("decimal_dot"),
      new ExpressionInfo(classOf[DecimalDot].getName, "decimal_dot"),
      (children: Seq[Expression]) => DecimalDot(children(0), children(1))),
    (new FunctionIdentifier("decimal_wdot"),
      new ExpressionInfo(classOf[DecimalWDot].getName, "decimal_wdot"),
      (children: Seq[Expression]) => DecimalWDot(children(0), children(1))),
    (new FunctionIdentifier("byte_sum_range"),
      new ExpressionInfo(classOf[ByteSumRange].getName, "byte_sum_range"),
      (children: Seq[Expression]) =>
        ByteSumRange(children(0), children(1), children(2))),
    (new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (children: Seq[Expression]) => SimHash16(children(0))),
    (new FunctionIdentifier("mattr_sum_distinct"),
      new ExpressionInfo(classOf[MattrSumDistinct].getName,
        "mattr_sum_distinct"),
      (children: Seq[Expression]) =>
        MattrSumDistinct(children(0), children(1))),
    (new FunctionIdentifier("pq_dists"),
      new ExpressionInfo(classOf[PqDists].getName, "pq_dists"),
      (children: Seq[Expression]) =>
        PqDists(children(0), children(1), children(2), children(3))),
    (new FunctionIdentifier("bootstrap_w32"),
      new ExpressionInfo(classOf[BootstrapW32].getName, "bootstrap_w32"),
      (children: Seq[Expression]) => BootstrapW32(children(0))),
    // catalyst's UnscaledValue: DECIMAL → its exact unscaled BIGINT —
    // a free field read for compact (p ≤ 18) decimals, loud
    // longValueExact past long range. Used by Det.dsumProd4 to multiply
    // scaled units as plain longs instead of BigDecimals.
    (new FunctionIdentifier("unscaled"),
      new ExpressionInfo(classOf[UnscaledValue].getName, "unscaled"),
      (children: Seq[Expression]) => UnscaledValue(children(0))),
    (new FunctionIdentifier("sum128"),
      new ExpressionInfo(classOf[Sum128].getName, "sum128"),
      (children: Seq[Expression]) =>
        if (children.size == 1)
          Sum128(children(0), Literal(null))
        else Sum128(children(0), children(1))))

  def ensureRegistered(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry
          .registerFunction(ident, info, builder)
      }
    }
}
