package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd exact-decimal WEIGHTED dot product:
  * `array<float>` vector · `array<double>` weights, at scale 8 —
  * bit-identical to the interpreted fold
  *
  *   `CAST(aggregate(zip_with(v, w, (x, c) -> CAST(CAST(x AS DOUBLE) *
  *    c AS DECIMAL(20,8))), 0 :: DECIMAL(30,8),
  *    (acc, p) -> CAST(acc + p AS DECIMAL(30,8))) AS DOUBLE)`
  *
  * and therefore to the DuckDB oracle mirrors of the md5-derived
  * hyperplane projections ([[graft.operators.VectorOps.annBuckets]]'s
  * k + 0.5 half weights, q_embed_rp's ±1 signs). The interpreted fold
  * allocates a Decimal per element per row per plane; this is one tight
  * long-accumulating loop inside whole-stage codegen.
  *
  * Determinism argument (the [[DecimalDot]] proof at scale 8): the
  * fixture products are exact in double — a float mantissa (24 bits)
  * times a half-integer weight |w| ≤ 16 (≤ 5 bits) is < 53 bits — and
  * Spark's double→DECIMAL(20,8) cast rounds the product's shortest
  * decimal string half-up (BigDecimal.valueOf). The fast path reproduces
  * that rounding in double arithmetic for |p| ≤ 16, where the
  * binary-vs-shortest-string discrepancy (≤ ~2·ulp(p)·1e8 ≈ 5e-7) stays
  * far inside the EPS = 1e-4 guard band; boundary hits, |p| > 16, and
  * non-finite values take the exact BigDecimal route. The scale-8 sum is
  * exact in a long for any realistic dimension (64 dims × |p| ≤ 16 →
  * ≤ 1.1e11 ≪ 2^63).
  *
  * NULL/overflow semantics mirror the fold: null array, length mismatch
  * (zip_with pads with null), or null element → NULL; |term| ≥ 1e12
  * (DECIMAL(20,8)) or |acc| ≥ 1e22 (DECIMAL(30,8)) and non-finite
  * products throw under ANSI (the Spark 4 default), NULL otherwise.
  * Equality with the interpreted fold is property-locked in
  * FunctionsAndSourcesSpec.
  */
case class DecimalWDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decimal_wdot requires (array<float>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_wdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DecimalWDot.dot(x, y)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Double $boxed = graft.functions.DecimalWDot.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DecimalWDot {
  private val Eps = 1e-4
  // DECIMAL(20,8) holds |v| < 1e12
  private val TermOverflow = 1e12
  // DECIMAL(30,8) accumulator bound — the fold re-casts acc every step
  private val SumOverflow = new JBigDecimal("1e22")
  // fast-path bound: at |p| ≤ 16 the double-arithmetic rounding is
  // provably identical to BigDecimal.valueOf half-up at scale 8
  // (discrepancy ≤ ~2·ulp(16e8) ≈ 5e-7 ≪ Eps); covers every fixture
  // hyperplane product (|w| ≤ 7.5, |x| ≤ ~1)
  private val FastMaxP = 16.0

  /** `BigDecimal.valueOf(p).setScale(8, HALF_UP)` — the exact per-term
    * semantics of Spark's double→DECIMAL(20,8) cast. */
  private def slowTerm(p: Double): JBigDecimal =
    JBigDecimal.valueOf(p).setScale(8, RoundingMode.HALF_UP)

  private def overflow(p: Double, dt: String): java.lang.Double =
    if (org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
      throw new ArithmeticException(
        s"decimal_wdot: $p cannot be represented as $dt " +
          "(set spark.sql.ansi.enabled=false to return NULL instead)")
    else null

  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with pads with null
    var sum = 0L
    var bigSum: JBigDecimal = null // non-null once in BigDecimal mode
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = x.getFloat(i).toDouble * y.getDouble(i)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p))
        return overflow(p, "DECIMAL(20,8)")
      val ap = Math.abs(p)
      if (ap >= TermOverflow) return overflow(p, "DECIMAL(20,8)")
      if (bigSum == null && ap <= FastMaxP) {
        val ay = ap * 1e8
        val f = Math.floor(ay)
        val frac = ay - f
        if (frac > 0.5 + Eps) {
          val r = f.toLong + 1L; sum += (if (p < 0) -r else r)
        } else if (frac < 0.5 - Eps) {
          val r = f.toLong; sum += (if (p < 0) -r else r)
        } else sum += slowTerm(p).unscaledValue().longValueExact()
      } else {
        if (bigSum == null)
          bigSum = new JBigDecimal(BigInteger.valueOf(sum), 8)
        bigSum = bigSum.add(slowTerm(p))
        if (bigSum.abs.compareTo(SumOverflow) >= 0)
          return overflow(p, "DECIMAL(30,8)")
      }
      i += 1
    }
    val result =
      if (bigSum != null) bigSum
      else new JBigDecimal(BigInteger.valueOf(sum), 8)
    java.lang.Double.valueOf(result.doubleValue())
  }
}
