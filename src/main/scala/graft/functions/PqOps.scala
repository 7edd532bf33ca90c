package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization sub-space distance table:
  * `pq_dists(iv, cbs, pqm, subdim)` computes, for every sub-space
  * m ∈ [0, pqm) and every codebook entry c ∈ cbs, the exact integer
  * squared L2 distance between the m-th `subdim`-wide slice of `iv`
  * and the matching slice of `c.cv`, emitted as
  * `array<array<struct<dist:bigint, cid:bigint>>>` (outer = sub-space,
  * inner = codebook entry, same shapes as the fold it replaces).
  *
  * Replaces the interpreted triple-nested HOF fold of
  * [[graft.operators.VectorOps]]'s pqEncoded/residualDistsExpr —
  * `transform(sequence) × transform(cbs) ×
  * aggregate(zip_with(slice, slice))` — pqm × |cbs| × subdim
  * interpreted lambda steps per row, each allocating two slices and a
  * zipped pair array (the r13 verdict's top next-round item: the ANN
  * family's largest remaining interpreted hot loop).
  *
  * Exact-result contract with the HOF form, including its edge
  * arithmetic (pinned in PqDistsSpec against the verbatim fold):
  *   - slice past the end of either array yields the available prefix;
  *     two EMPTY slices fold to dist 0 (aggregate over an empty zip);
  *   - slices of UNEQUAL length: zip_with pads the shorter with NULL,
  *     (x−y) poisons, the aggregate sum is NULL → dist NULL;
  *   - a NULL element inside either slice → dist NULL (same poisoning);
  *   - NULL `iv` or NULL `c.cv` → dist NULL; NULL `cbs` → the inner
  *     array is NULL for every sub-space; a NULL codebook STRUCT
  *     element yields struct(NULL, NULL) (struct() itself never nulls).
  * All arithmetic is Java long (the engine's scaled-int grid bounds
  * every diff² · subdim sum far below 2^63 — see the q_ann_pq scale
  * note).
  */
case class PqDists(iv: Expression, cbs: Expression,
    pqm: Expression, subDim: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(iv, cbs, pqm, subDim)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_dists"

  override def checkInputDataTypes(): TypeCheckResult = {
    val cbOk = cbs.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs(0).dataType == LongType &&
        fs(1).dataType.isInstanceOf[ArrayType] &&
        fs(1).dataType.asInstanceOf[ArrayType].elementType == LongType =>
        true
      case _ => false
    }
    val ivOk = iv.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!ivOk || !cbOk)
      TypeCheckResult.TypeCheckFailure(
        "pq_dists requires (array<bigint>, array<struct<cid:bigint, " +
          s"cv:array<bigint>>>), got (${iv.dataType}, ${cbs.dataType})")
    else if (pqm.dataType != IntegerType || subDim.dataType != IntegerType
        || !pqm.foldable || !subDim.foldable)
      TypeCheckResult.TypeCheckFailure(
        "pq_dists requires literal int (pqm, subdim)")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val entryType = StructType(Seq(
    StructField("dist", LongType, nullable = true),
    StructField("cid", LongType, nullable = true)))
  override def dataType: DataType = ArrayType(
    ArrayType(entryType, containsNull = false), containsNull = true)

  @transient private lazy val pqmV: Int = pqm.eval().asInstanceOf[Int]
  @transient private lazy val subV: Int = subDim.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val ivV = iv.eval(input)
    val cbV = cbs.eval(input)
    PqDists.compute(
      if (ivV == null) null else ivV.asInstanceOf[ArrayData],
      if (cbV == null) null else cbV.asInstanceOf[ArrayData],
      pqmV, subV)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val a = iv.genCode(ctx)
    val b = cbs.genCode(ctx)
    val mod = "graft.functions.PqDists$.MODULE$"
    val ad = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${a.code}
        ${b.code}
        $ad ${ev.value} = $mod.compute(
          ${a.isNull} ? null : ${a.value},
          ${b.isNull} ? null : ${b.value}, $pqmV, $subV);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

object PqDists {
  /** The compiled distance-table loop — public so generated code can
    * call it. Result shapes and NULL arithmetic mirror the HOF fold
    * exactly (see the class doc). */
  def compute(iv: ArrayData, cbs: ArrayData, pqm: Int,
      sub: Int): ArrayData = {
    val outer = new Array[Any](pqm)
    var m = 0
    while (m < pqm) {
      if (cbs == null) outer(m) = null
      else {
        val k = cbs.numElements()
        val inner = new Array[Any](k)
        var c = 0
        while (c < k) {
          if (cbs.isNullAt(c)) {
            inner(c) = new GenericInternalRow(Array[Any](null, null))
          } else {
            val st = cbs.getStruct(c, 2)
            val cid: Any = if (st.isNullAt(0)) null else st.getLong(0)
            val cv: ArrayData =
              if (st.isNullAt(1)) null else st.getArray(1)
            inner(c) =
              new GenericInternalRow(Array[Any](dist(iv, cv, m, sub), cid))
          }
          c += 1
        }
        outer(m) = new GenericArrayData(inner)
      }
      m += 1
    }
    new GenericArrayData(outer)
  }

  /** dist for one (sub-space, codebook entry): NULL exactly when the
    * HOF's zip_with/aggregate chain would be NULL. */
  private def dist(iv: ArrayData, cv: ArrayData, m: Int, sub: Int): Any = {
    if (iv == null || cv == null) return null
    val start = m * sub
    val aLen = math.max(0, math.min(sub, iv.numElements() - start))
    val bLen = math.max(0, math.min(sub, cv.numElements() - start))
    // zip_with pads the shorter slice with NULL → (x−y) NULL → the
    // aggregate sum poisons to NULL
    if (aLen != bLen) return null
    var s = 0L
    var k = start
    val end = start + aLen
    while (k < end) {
      if (iv.isNullAt(k) || cv.isNullAt(k)) return null
      val d = iv.getLong(k) - cv.getLong(k)
      s += d * d
      k += 1
    }
    s
  }
}
