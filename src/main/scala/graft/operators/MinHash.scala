package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash/LSH building blocks — single source of truth for the
  * declared query (q_dedup_minhash + its DuckDB oracle) and the
  * [[TextDedup]] pipeline, so a tuning change cannot silently diverge.
  *
  * Hashing is md5 (identical on Spark and DuckDB); signatures are
  * lexicographic minima over hex strings; band keys INCLUDE the band
  * index so hashes from different band positions can never collide
  * across documents.
  */
object MinHash {
  val DefaultHashes = 8
  val DefaultBands = 4

  /** Adds `toks` + `sig_0..sig_{n-1}` columns (3-token shingles; rows
    * with fewer than 3 tokens are dropped — they have no shingles). */
  def withSignatures(df: DataFrame, textCol: String = "text",
      numHashes: Int = DefaultHashes): DataFrame = {
    val base = tokens(df, textCol)
      .withColumn("shingles", expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"))
    val sigs = (0 until numHashes).map(i =>
      expr(s"array_min(transform(shingles, s -> md5(concat('$i|', s))))")
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
