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
    * token-set Jaccard, filtered to `threshold`.
    *
    * Candidate generation is ONE shuffle of slim (id, band) rows: group by
    * band key, emit the in-row id-pair combinations of each bucket. This
    * computes the (expensive) MinHash signatures once — a band-key
    * self-join would recompute the whole signature subtree on both sides
    * and shuffle token arrays 2·bands times. Bucket pair fan-out is
    * quadratic in BUCKET size only; band buckets are near-dup clusters,
    * so real corpora keep them tiny — and [[candidatePairs]]'s
    * `maxBucket` cap ENFORCES the bound on a degenerate corpus. */
  def nearDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numHashes: Int = 8, numBands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val signed = MinHash.withSignatures(base, "text", numHashes)
    val toks = MinHash.tokens(base, "text")
    withJaccard(candidatePairs(signed, numHashes, numBands), toks)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Band-bucket candidate pairs from an ALREADY-SIGNED frame — split
    * out so multi-config callers (q_dedup_bands_curve) band the same
    * signatures several ways without recomputing them. Bucket-mates →
    * in-row ordered pairs (ids sorted, so a < b); distinct collapses
    * multi-band collisions.
    *
    * DEGENERATE-BUCKET CAP: a hot band bucket (boilerplate corpus — the
    * same page template a million times) would otherwise cost a
    * quadratic pair bill AND an unbounded collect_list row. The
    * `maxBucket` cap bounds BOTH: a band-partitioned row_number keeps
    * only the `maxBucket` lowest ids of each bucket BEFORE the list
    * assembles, so a bucket's pair fan-out never exceeds
    * maxBucket·(maxBucket−1)/2 and no task materializes more than
    * maxBucket ids in one row. Truncation is deterministic (lowest ids
    * survive — the exact-dedup survivor convention) and lossy-tolerant
    * by construction: members of a truncated bucket are near-identical,
    * so the surviving members still link the cluster (transitively via
    * the kept lowest ids), which is what dedup consumes. The cap is far
    * above any real bucket at declared scale (DedupPipelineSpec pins
    * the fixture maximum and exercises the cap on a degenerate
    * corpus). */
  def candidatePairs(signed: DataFrame, numHashes: Int = 8,
      numBands: Int = 4, maxBucket: Int = 1024): DataFrame = {
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("band").orderBy("id")
    signed.select(col("id"),
        explode(array(MinHash.bandKeys(numHashes, numBands): _*))
          .as("band"))
      .withColumn("_rn", row_number().over(wb))
      .filter(col("_rn") <= maxBucket)
      .groupBy("band").agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // pair expansion as two CHAINED GENERATORS (posexplode anchor +
      // explode of the sorted tail slice) — the q_embed_cov lesson:
      // nested transform/flatten HOFs are interpreted and allocate a
      // struct per pair, generators stay inside whole-stage codegen;
      // ids stay sorted so id_a < id_b holds as before
      .select(col("ids"), posexplode(col("ids")))
      .toDF("ids", "i", "id_a")
      .select(col("id_a"),
        explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("id_b"))
      .distinct()
  }

  /** Exact token-set Jaccard for candidate pairs; token sets re-joined
    * here so only candidate pairs ever shuffle an array. `toks` needs
    * (id, toks) columns.
    *
    * r13 OPTIMIZATION (guide §2.3 "shuffle fewer bytes" + per-pair
    * work): the per-PAIR `array_distinct` (twice) and the materialized
    * `array_union` (allocates |A|+|B| elements per pair) move to
    * per-DOC precomputation — each side ships its already-distinct
    * token set plus its size, and the union size is the exact identity
    * |A∪B| = |A| + |B| − |A∩B|. A doc in k candidate pairs used to pay
    * k distinct passes per side and k union allocations; now one
    * distinct pass before the join, and the join shuffles the same
    * arrays it always shipped (dedup'd, so never larger). Jaccard is
    * the same integer division: array_intersect over distinct arrays
    * is |A∩B| exactly as before. */
  def withJaccard(cands: DataFrame, toks: DataFrame): DataFrame = {
    val dtoks = toks.select(col("id"),
      array_distinct(col("toks")).as("dtoks"))
      .withColumn("ntoks", size(col("dtoks")))
    cands
      .join(dtoks.select(col("id").as("id_a"), col("dtoks").as("toks_a"),
        col("ntoks").as("n_a")), "id_a")
      .join(dtoks.select(col("id").as("id_b"), col("dtoks").as("toks_b"),
        col("ntoks").as("n_b")), "id_b")
      .withColumn("inter", size(array_intersect(
        col("toks_a"), col("toks_b"))))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
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
