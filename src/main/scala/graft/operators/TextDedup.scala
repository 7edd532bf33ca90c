package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end near-duplicate detection pipeline — the production
  * composition of the declared building blocks:
  *
  *   shingle → MinHash signature → LSH band keys → band-bucket self-join
  *   (candidates only) → exact Jaccard verify → scored duplicate pairs
  *
  * Scale: candidate generation is a shuffle on band key (O(n·bands)), not
  * an O(n²) pair join — the only pairs ever materialized share at least
  * one band, i.e. are already likely duplicates. With 8 hashes in 4 bands
  * of 2, pairs with Jaccard ~0.9 collide in ≥1 band with p ≈ 99.7%;
  * Jaccard ~0.3 pairs with p ≈ 3.5% — tune bands/rows per corpus.
  */
object TextDedup {

  /** doc frame (idCol, textCol) → duplicate candidate pairs with exact
    * token-set Jaccard, filtered to `threshold`. */
  def nearDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numHashes: Int = 8, numBands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val signed = MinHash.withSignatures(
      docs.select(col(idCol).as("id"), col(textCol).as("text")),
      "text", numHashes)
    val banded = signed.select(col("id"), col("toks"),
      explode(array(MinHash.bandKeys(numHashes, numBands): _*)).as("band"))
    // candidates: pairs sharing ANY band (distinct to collapse multi-band
    // collisions) — the only shuffle keyed wider than the corpus itself
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.toks").as("toks_a"), col("y.toks").as("toks_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verify on the candidates only
    cands
      .withColumn("inter", size(array_intersect(
        array_distinct(col("toks_a")), array_distinct(col("toks_b")))))
      .withColumn("uni", size(array_union(
        array_distinct(col("toks_a")), array_distinct(col("toks_b")))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Keep-one-per-group exact dedup by normalized-text fingerprint:
    * deterministic survivor = lowest id. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col(idCol))
    docs.withColumn("fp", md5(lower(trim(col(textCol)))))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("fp", "_rn")
  }
}
