package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native batched bootstrap-weight kernel for q_stats_bootstrap_se:
  * `bootstrap_w32(event_id)` emits the event's 32 resample weights
  * w_b ∈ {0, 1, 2} in one compiled call — four raw MD5 digests of
  * "a_"/"b_"/"c_"/"d_" + the id's decimal string, each digest read as
  * its 8 big-endian 16-bit chunks mod 3.
  *
  * Replaces the interpreted derivation chain — 4 × md5 (each
  * materializing a 32-char hex string) + 12 × conv (each a per-call
  * radix string parse) + 32 div/mod projections per event (the r13
  * verdict's item 4). Bit-exact equivalence with that chain, pinned in
  * ByteOpsSpec against the verbatim expressions: chunk c of digest d is
  * hex chars [4c+1, 4c+4] = digest bytes (2c, 2c+1) as an unsigned
  * big-endian 16-bit integer, exactly what
  * `conv(substring(hex, …), 16, 10)` div/mod 65536 selects; the decimal
  * id string is `Long.toString`, identical to `CAST(id AS STRING)`.
  * NULL id → NULL (the old chain's md5(concat(NULL)) = NULL poisoned
  * every weight; consumers index the array, so element access on the
  * NULL array yields the same NULL weights).
  */
case class BootstrapW32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bootstrap_w32 requires bigint, got $t")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bootstrap_w32"

  override def nullSafeEval(id: Any): Any =
    BootstrapW32.compute(id.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.BootstrapW32$$.MODULE$$" +
        s".compute($id);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object BootstrapW32 {
  /** The compiled weight loop — public so generated code can call it. */
  def compute(id: Long): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val idStr = java.lang.Long.toString(id)
    val ws = new Array[Long](32)
    var d = 0
    while (d < 4) {
      val key = ('a' + d).toChar + "_" + idStr
      val digest = md.digest(key.getBytes("UTF-8"))
      var c = 0
      while (c < 8) {
        val chunk = ((digest(2 * c) & 0xff) << 8) | (digest(2 * c + 1) & 0xff)
        ws(8 * d + c) = (chunk % 3).toLong
        c += 1
      }
      d += 1
    }
    new GenericArrayData(ws)
  }
}
