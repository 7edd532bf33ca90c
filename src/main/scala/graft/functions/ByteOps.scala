package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType}

/** Native codegen'd sum of unsigned byte values over a BINARY slice
  * [from, until) — the whole-header reduction of the multimodal parse
  * family (tar's 512-byte checksum), which the higher-order-function
  * form evaluated as 512 interpreted `conv(substring(hex, 2i+1, 2))`
  * lambda steps PER ROW (r13 measured: 13.1 s of the old
  * q_multimodal_tar's 13.4 s total at sf0.1 was this fold). Identical
  * integer result: Σ of the same unsigned byte values, indices clamped
  * to the payload, in a compiled loop.
  */
case class ByteSumRange(bytes: Expression, from: Expression,
    until: Expression) extends TernaryExpression {

  override def first: Expression = bytes
  override def second: Expression = from
  override def third: Expression = until

  override def checkInputDataTypes(): TypeCheckResult =
    (bytes.dataType, from.dataType, until.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"byte_sum_range requires (binary, int, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum_range"

  override def nullSafeEval(b: Any, f: Any, u: Any): Any = {
    val arr = b.asInstanceOf[Array[Byte]]
    val lo = math.max(f.asInstanceOf[Int], 0)
    val hi = math.min(u.asInstanceOf[Int], arr.length)
    var s = 0L
    var i = lo
    while (i < hi) { s += (arr(i) & 0xff); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, f, u) => {
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val s = ctx.freshName("s")
      s"""
         |int $lo = Math.max($f, 0);
         |int $hi = Math.min($u, $b.length);
         |long $s = 0L;
         |for (int $i = $lo; $i < $hi; $i++) {
         |  $s += ($b[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

/** Native codegen'd 16-bit SimHash vote-and-assemble over an
  * `array<string>` of (md5 hex) token hashes — bit j's vote is
  * Σ_tokens (2·bit_j(hash) − 1) over the hash's first four hex digits
  * (digit j/4, bit 3 − j%4, MSB-first), and the result sets 2^j for
  * every strictly positive vote. Replaces the nested interpreted
  * aggregate-in-aggregate fold (16 × |tokens| lambda steps per row,
  * each an instr + substring + pow: r13 measured 8.4 s of the old
  * q_dedup_simhash's 8.5 s total at sf0.1) with one compiled loop that
  * parses each hash's 4 leading nibbles once.
  *
  * Exact-result contract with the HOF form it replaces, including its
  * edge arithmetic: a hex digit outside [0-9a-f] contributed
  * 2·((instr−1 = −1 div-floored and %2'd) = −1) − 1 = −3 to every bit
  * of that digit; a hash shorter than 4 chars reads as nibble 0
  * (contribution −1); a NULL array element poisoned every bit's inner
  * sum to NULL, turning every CASE to the 0 arm — i.e. result 0; so
  * does a NULL array. All four behaviors are reproduced bit-for-bit
  * (SimHashSpec pins them against the HOF expression).
  *
  * NULL CONTRACT (r13 ADVICE, deliberate): NULL input → 0L, with
  * nullable = false — this reproduces the HOF fold's NULL-poisoning
  * arithmetic (every vote NULL → every CASE takes the 0 arm → 0), which
  * is the value q_dedup_simhash's oracle mirrors. A caller that needs
  * to distinguish NULL input from a legitimate simhash of 0 must guard
  * with isNotNull BEFORE calling (as q_dedup_simhash's text filter
  * does); changing the function to return NULL would flip the declared
  * query's output column nullability mid-contract.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash16 requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash16"

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash16.compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // call the companion's compiled loop via its singleton instance
    // (Java source cannot rely on Scala static forwarders here)
    val mod = "graft.functions.SimHash16$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $mod.compute(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object SimHash16 {
  /** The compiled vote loop — public so generated code can call it. */
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Long](16)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return 0L // NULL element poisons every vote
      val h = hs.getUTF8String(i)
      val len = h.numChars()
      var d = 0
      while (d < 4) {
        // nibble of hex digit d; beyond-length reads as '0' (nibble 0),
        // a non-hex char keeps the HOF form's instr−1 = −1 arithmetic
        val ch = if (d < len) h.getByte(d).toChar else '0'
        val nib =
          if (ch >= '0' && ch <= '9') ch - '0'
          else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
          else -1
        var b = 0
        while (b < 4) {
          val j = 4 * d + b
          votes(j) +=
            (if (nib < 0) -3L else 2L * ((nib >> (3 - b)) & 1) - 1L)
          b += 1
        }
        d += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Native O(n) moving-average-TTR kernel: the sum over every W-token
  * sliding window of the window's distinct-type count (n < W falls back
  * to one whole-array distinct count) — q_text_mattr's in-row fold. The
  * HOF form was O(n·W) interpreted (per window: a 50-element slice
  * allocation + array_distinct), the open ADVICE r12 scaling item (a
  * 100k-token doc paid ~5M list_distinct evaluations in one row); this
  * loop maintains one token-count map and a live distinct counter —
  * add the entering token, drop the leaving one — so each token is
  * touched twice regardless of W. Identical integers: the same
  * per-window distinct counts are summed (ByteOpsSpec pins equivalence
  * against the HOF expression, including null elements, which
  * array_distinct counts once).
  */
case class MattrSumDistinct(toks: Expression, window: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = toks
  override def right: Expression = window

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, window.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"mattr_sum_distinct requires (array<string>, int), got ($a, $b)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "mattr_sum_distinct"

  override def nullSafeEval(t: Any, w: Any): Any =
    MattrSumDistinct.compute(t.asInstanceOf[ArrayData],
      w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.MattrSumDistinct$$.MODULE$$" +
        s".compute($t, $w);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object MattrSumDistinct {
  /** One slot per distinct token; null elements use a reserved key so
    * they count once, like array_distinct. */
  def compute(arr: ArrayData, w: Int): Long = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[AnyRef, Integer]()
    def keyAt(i: Int): AnyRef =
      if (arr.isNullAt(i)) MattrSumDistinct.NullKey
      else arr.getUTF8String(i)
    // returns the token's count AFTER adding one occurrence
    def add(k: AnyRef): Int = {
      val c = counts.get(k)
      val next = if (c == null) 1 else c.intValue() + 1
      counts.put(k, Integer.valueOf(next))
      next
    }
    if (n < w) {
      var i = 0
      while (i < n) { add(keyAt(i)); i += 1 }
      return counts.size().toLong
    }
    var distinct = 0
    var i = 0
    while (i < w) {
      if (add(keyAt(i)) == 1) distinct += 1
      i += 1
    }
    var sum = distinct.toLong
    while (i < n) {
      if (add(keyAt(i)) == 1) distinct += 1
      val leaving = keyAt(i - w)
      val left = counts.get(leaving).intValue() - 1
      if (left == 0) { counts.remove(leaving); distinct -= 1 }
      else counts.put(leaving, Integer.valueOf(left))
      sum += distinct
      i += 1
    }
    sum
  }
  private val NullKey: AnyRef = new Object
}
