package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{MinHash, TextDedup}

/** Streaming near-duplicate INGESTION: "is this new document a near-dup
  * of anything already seen?" as a stateful operator over the live doc
  * feed — the reference's bus-side counterpart of the batch
  * [[graft.operators.TextDedup.nearDuplicates]] pipeline (mount empty,
  * SURVEY.md §0), and the one dedup stage a training-data pipeline needs
  * ON ingestion rather than in the nightly batch.
  *
  * Composition (each stage the streaming twin of its batch half):
  *
  *   1. [[bandedSignatures]] — stateless in-row shingle → MinHash →
  *      band-key explode, the EXACT [[MinHash]] expressions the batch
  *      q_dedup_minhash/q_dedup_pairs path uses (one md5 per shingle,
  *      XOR family, band index inside the key);
  *   2. [[candidateStream]] — per-BAND-bucket keyed state (the ids seen
  *      in that bucket, the streaming image of the batch group-by-band
  *      bucket): each arriving doc emits ordered candidate pairs against
  *      its bucket-mates — earlier arrivals from state, same-batch
  *      arrivals in-row — and joins the bucket. Replayed doc_ids are
  *      idempotent (already-seen ids emit nothing, the
  *      dropDuplicatesWithinWatermark analogue for this keyed state);
  *   3. [[nearDupPairsStream]] — streaming `dropDuplicates` collapses
  *      multi-band/multi-batch re-discoveries of the same pair (the
  *      batch `.distinct()`), then the exact-Jaccard verify joins ONLY
  *      candidate pairs against the token store — the same
  *      verify-touches-candidates-only economics as the batch plan.
  *
  * Scale: band-bucket state is slim ids (O(corpus·bands) longs total,
  * spread across executors by band key — exactly what the batch shuffle
  * carries); candidate fan-out is quadratic in BUCKET size only, the
  * LSH guarantee. The verify side is a stream-static join against the
  * corpus token store (at 100 TB: the upserted document table, re-read
  * per micro-batch) — candidates never shuffle token arrays. The
  * pair-dedup state is one row per DISCOVERED pair (near-dups are the
  * sliver); a production deployment bounds it with
  * `dropDuplicatesWithinWatermark` once pairs carry an event time.
  *
  * Parity: StreamingParitySpec proves streamed pair discovery over a
  * multi-batch replay equals `q_dedup_pairs` on the same documents —
  * same pairs, same exact-decimal Jaccard.
  */
object NearDupStream {

  /** Slim (band key, doc id) row — all the state machinery ever sees. */
  case class BandDoc(band: String, doc_id: Long)

  case class CandPair(id_a: Long, id_b: Long)

  /** Ids already in a band bucket, in arrival order. */
  case class BucketState(ids: Seq[Long])

  /** Stateless in-row banding of a (doc_id, text) stream: the shared
    * [[MinHash]] signature + band-key expressions, exploded to slim
    * (band, doc_id) rows. Docs with < 3 tokens have no shingles and are
    * dropped — the batch pipeline's universe rule. */
  def bandedSignatures(docs: DataFrame,
      numHashes: Int = MinHash.DefaultHashes,
      numBands: Int = MinHash.DefaultBands): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    MinHash.withSignatures(docs.select(col("doc_id"), col("text")),
        "text", numHashes)
      .select(col("doc_id"),
        explode(array(MinHash.bandKeys(numHashes, numBands): _*))
          .as("band"))
      .select(col("band"), col("doc_id"))
      .as[BandDoc]
  }

  /** Band-bucket keyed state → ordered candidate pairs. Each fresh doc
    * pairs with every bucket-mate (state first, then same-batch combos in
    * sorted order) and joins the bucket; re-deliveries of a seen id are
    * no-ops. Pairs are (min, max)-ordered so every discovery of the same
    * pair renders identically — the downstream dedup key. */
  def candidateStream(bands: Dataset[BandDoc]): Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.band)
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[BandDoc], state: GroupState[BucketState]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val seenSet = seen.toSet
          val fresh = it.map(_.doc_id).toVector.distinct.sorted
            .filterNot(seenSet)
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(BucketState(seen ++ fresh))
            val out = Vector.newBuilder[CandPair]
            for (n <- fresh; o <- seen)
              out += (if (o < n) CandPair(o, n) else CandPair(n, o))
            for (i <- fresh.indices; j <- i + 1 until fresh.size)
              out += CandPair(fresh(i), fresh(j))
            out.result().iterator
          }
      }
  }

  /** The full ingestion twin: banded candidates, streaming pair-dedup,
    * exact token-set Jaccard verify at `threshold` against `docStore`
    * (the corpus-so-far (doc_id, text) table; static per micro-batch).
    * Emits (id_a, id_b, jaccard) append rows — the q_dedup_pairs
    * relation, discovered incrementally. */
  def nearDupPairsStream(docs: DataFrame, docStore: DataFrame,
      threshold: Double = 0.7,
      numHashes: Int = MinHash.DefaultHashes,
      numBands: Int = MinHash.DefaultBands): DataFrame = {
    val cands = candidateStream(bandedSignatures(docs, numHashes, numBands))
      .toDF()
      .dropDuplicates("id_a", "id_b")
    val toks = MinHash.tokens(
        docStore.select(col("doc_id").as("id"), col("text")), "text")
      .select("id", "toks")
    TextDedup.withJaccard(cands, toks)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
