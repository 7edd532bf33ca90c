package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash/LSH building blocks — single source of truth for the
  * declared query (q_dedup_minhash + its DuckDB oracle) and the
  * [[TextDedup]] pipeline, so a tuning change cannot silently diverge.
  *
  * Hashing is md5 (identical on Spark and DuckDB), computed ONCE per
  * shingle; the per-index hash family derives from hex-string ROTATIONS
  * of that single digest (`rot_i(h) = h[4i+1..32] || h[1..4i]`) — each
  * rotation is a bijection on 128-bit values, so every index is a valid
  * min-wise hash, at 1/numHashes the hashing cost of independent salted
  * digests (md5 was ~80% of signature time). Indices are correlated (the
  * one-permutation-hashing trade-off, Li/Owen/Zhang NIPS 2012); band
  * keys INCLUDE the band index so hashes from different band positions
  * can never collide across documents. Signatures are lexicographic
  * minima over hex strings.
  */
object MinHash {
  val DefaultHashes = 8
  val DefaultBands = 4

  /** Hex rotation by 4·i chars, as a SQL fragment over variable `h`. */
  private def rotExpr(i: Int): String =
    if (i == 0) "h"
    else s"concat(substring(h, ${4 * i + 1}, ${32 - 4 * i}), " +
      s"substring(h, 1, ${4 * i}))"

  /** DuckDB mirror of [[rotExpr]] over column/alias `h`. */
  def sqlRot(i: Int, h: String = "h"): String =
    if (i == 0) h
    else s"substring($h, ${4 * i + 1}, ${32 - 4 * i}) || " +
      s"substring($h, 1, ${4 * i})"

  /** Adds `toks` + `sig_0..sig_{n-1}` columns (3-token shingles; rows
    * with fewer than 3 tokens are dropped — they have no shingles). */
  def withSignatures(df: DataFrame, textCol: String = "text",
      numHashes: Int = DefaultHashes): DataFrame = {
    val base = tokens(df, textCol)
      .withColumn("shash", expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"))
    val sigs = (0 until numHashes).map(i =>
      expr(s"array_min(transform(shash, h -> ${rotExpr(i)}))")
        .as(s"sig_$i"))
    base.select((df.columns.map(col) :+ col("toks")) ++ sigs: _*)
  }

  /** Just the tokenization used by [[withSignatures]] (same ≥3-token
    * filter), for callers that need token sets without the signature
    * columns. */
  def tokens(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("toks", split(col(textCol), " "))
      .filter(size(col("toks")) >= 3)

  /** Band key for band `b` over `rows` consecutive signatures. */
  def bandKey(b: Int, rows: Int): Column =
    md5(concat(lit(s"$b|") +:
      (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*))

  def bandKeys(numHashes: Int = DefaultHashes,
      numBands: Int = DefaultBands): Seq[Column] = {
    val rows = numHashes / numBands
    (0 until numBands).map(b => bandKey(b, rows).as(s"band_$b"))
  }
}
