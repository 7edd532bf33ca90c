package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash/LSH building blocks — single source of truth for the
  * declared query (q_dedup_minhash + its DuckDB oracle) and the
  * [[TextDedup]] pipeline, so a tuning change cannot silently diverge.
  *
  * Hashing is md5 (identical on Spark and DuckDB), computed ONCE per
  * shingle and folded to a 60-bit integer (first 15 hex chars). The
  * per-index hash family is `h_i(v) = v XOR seed_i` — XOR with a fixed
  * 60-bit seed is a bijection on the 60-bit value space, so every index
  * is a valid min-wise hash. Indices are correlated (the
  * one-permutation-hashing trade-off, Li/Owen/Zhang NIPS 2012); band
  * keys INCLUDE the band index so hashes from different band positions
  * can never collide across documents. Signatures are BIGINT minima —
  * the earlier hex-string-rotation family spent ~1 s per sf0.1 run on
  * substring/concat allocations (8 string passes per shingle array);
  * the XOR family is pure 64-bit arithmetic inside whole-stage codegen.
  */
object MinHash {
  val DefaultHashes = 8
  val DefaultBands = 4

  /** Deterministic 60-bit seeds for the XOR family: first 15 hex chars
    * of md5("graft_minhash_seed_<i>"). Embedded as literals in BOTH
    * engines' SQL, so the derivation only has to be deterministic, not
    * re-computable in SQL. */
  val seeds: IndexedSeq[Long] = (0 until 16).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft_minhash_seed_$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Adds `toks` + BIGINT `sig_0..sig_{n-1}` columns (3-token shingles;
    * rows with fewer than 3 tokens are dropped — they have no shingles).
    * One md5 + one hex→int fold per shingle; per-index work is a single
    * XOR+min pass over the integer array. */
  def withSignatures(df: DataFrame, textCol: String = "text",
      numHashes: Int = DefaultHashes): DataFrame = {
    val base = tokens(df, textCol)
      .withColumn("hv", expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> CAST(conv(substring(md5(concat(toks[i], ' ', toks[i+1], " +
          "' ', toks[i+2])), 1, 15), 16, 10) AS BIGINT))"))
    val sigs = (0 until numHashes).map(i =>
      expr(s"array_min(transform(hv, v -> v ^ ${seeds(i)}L))")
        .as(s"sig_$i"))
    base.select((df.columns.map(col) :+ col("toks")) ++ sigs: _*)
  }

  /** DuckDB mirror of the per-shingle integer fold, over hex-digest
    * expression `h`. */
  def sqlHashVal(h: String = "h"): String =
    s"CAST('0x' || substring($h, 1, 15) AS BIGINT)"

  /** DuckDB mirror of signature `i` as an aggregate over [[sqlHashVal]]
    * values named `v`. */
  def sqlSig(i: Int, v: String = "v"): String =
    s"min(xor($v, ${seeds(i)}))"

  /** Just the tokenization used by [[withSignatures]] (same ≥3-token
    * filter), for callers that need token sets without the signature
    * columns. */
  def tokens(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("toks", split(col(textCol), " "))
      .filter(size(col("toks")) >= 3)

  /** Band key for band `b` over `rows` consecutive signatures:
    * md5 over "b|sig|sig|…" (decimal renderings — identical on both
    * engines; the band index prefix keeps bands collision-disjoint). */
  def bandKey(b: Int, rows: Int): Column =
    md5(concat_ws("|", lit(s"$b") +:
      (0 until rows).map(r => col(s"sig_${b * rows + r}").cast("string")): _*))

  /** DuckDB mirror of [[bandKey]] over columns `sig_<i>`. */
  def sqlBandKey(b: Int, rows: Int): String =
    s"md5('$b|' || " + (0 until rows)
      .map(r => s"CAST(sig_${b * rows + r} AS VARCHAR)")
      .mkString(" || '|' || ") + ")"

  def bandKeys(numHashes: Int = DefaultHashes,
      numBands: Int = DefaultBands): Seq[Column] = {
    val rows = numHashes / numBands
    (0 until numBands).map(b => bandKey(b, rows).as(s"band_$b"))
  }
}
