package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence assembly for LLM pretraining / retrieval pipelines:
  * fixed-budget sequence PACKING (concatenate the token stream, cut every
  * N tokens — documents may straddle a boundary, the standard pretraining
  * layout) and sliding-window CHUNKING with overlap (the RAG indexing
  * shape).
  *
  * Scale: packing is a prefix sum — a window per SHARD (deterministic
  * doc_id hash), because packing is per-worker in any real pipeline; a
  * single global ordering would serialize 100 TB through one partition.
  * Chunking is a narrow map + generate (explode) — linear, no shuffle
  * beyond the output sort. All arithmetic is integer → bit-identical on
  * both engines.
  */
object Packing {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Tokens per packed training sequence. */
  val SeqBudget = 256
  /** Chunk size / stride (overlap = size − stride) for RAG chunking. */
  val ChunkSize = 32
  val ChunkStride = 24
  /** Pack shards — the per-worker packing domains. */
  val PackShards = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-budget sequence packing: per shard, the token stream is laid
    // out in doc_id order and cut every SeqBudget tokens. Each document
    // reports its stream offset and the first/last sequence it lands in
    // (straddling docs span >1). floor/int arithmetic only.
    "q_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("shard")
        .orderBy(asc_nulls_last("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("shard", (col("doc_id") % PackShards).cast("long"))
        .withColumn("tok_len", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum_end", sum(col("tok_len")).over(w))
        .withColumn("start_off", col("cum_end") - col("tok_len"))
        .withColumn("first_seq",
          floor(col("start_off") / SeqBudget).cast("long"))
        .withColumn("last_seq",
          floor((col("cum_end") - 1) / SeqBudget).cast("long"))
        .select("doc_id", "shard", "tok_len", "start_off", "first_seq",
          "last_seq")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Packing-efficiency report over the q_pack_sequences layout — the
    // number that prices a packing policy: per shard, sequences minted,
    // fill rate against the SeqBudget capacity, and how many documents
    // straddle a sequence boundary (each split doc costs attention-mask
    // plumbing or a truncation). One keyed aggregate over the layout
    // frame; fill_rate is a single IEEE division of exact integers.
    "q_pack_efficiency" -> ((s, d) =>
      queries("q_pack_sequences")(s, d)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("tok_len").as("total_tokens"),
          (max("last_seq") + 1L).as("n_seqs"),
          sum(when(col("first_seq") =!= col("last_seq"), 1L)
            .otherwise(0L)).as("n_split_docs"))
        .withColumn("capacity", col("n_seqs") * lit(SeqBudget.toLong))
        .withColumn("fill_rate",
          col("total_tokens").cast("double") / col("capacity"))
        .select("shard", "n_docs", "total_tokens", "n_seqs",
          "n_split_docs", "capacity", "fill_rate")
        .orderBy(asc_nulls_last("shard"))),

    // Sliding-window chunking with overlap: chunk c covers tokens
    // [c·stride, c·stride + size). Emits one row per chunk with its
    // reassembled text — the RAG indexing layout.
    "q_text_chunk" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        // chunk starts at c·stride for c in [0, floor((n−1)/stride)]:
        // every start is < n by construction, and the tail chunk may be
        // short (or even fully inside the previous chunk's window for
        // n ≤ prev_start + size — the standard sliding layout keeps it:
        // it is the only chunk whose span ENDS the document)
        .withColumn("chunk_id", explode(expr(
          s"sequence(0, CAST(floor((n_toks - 1) / $ChunkStride) AS INT))")))
        .withColumn("tok_start",
          (col("chunk_id").cast("long") * ChunkStride).cast("long"))
        .withColumn("chunk_len",
          least(lit(ChunkSize), col("n_toks") - col("tok_start"))
            .cast("long"))
        .withColumn("chunk_text", expr(
          s"array_join(slice(toks, CAST(tok_start AS INT) + 1, $ChunkSize), ' ')"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("tok_start"), col("chunk_len"), col("chunk_text"))
        .orderBy(asc_nulls_last("doc_id"), asc_nulls_last("chunk_id")))
  )

  val oracle: Map[String, String] = Map(
    "q_pack_sequences" ->
      s"""WITH b AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_len
         |  FROM documents WHERE text IS NOT NULL
         |), c AS (
         |  SELECT doc_id, shard, tok_len,
         |    SUM(tok_len) OVER (PARTITION BY shard
         |      ORDER BY doc_id ASC NULLS LAST
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
         |  FROM b
         |)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard, tok_len,
         |  CAST(cum_end - tok_len AS BIGINT) AS start_off,
         |  CAST(floor((cum_end - tok_len) / $SeqBudget) AS BIGINT)
         |    AS first_seq,
         |  CAST(floor((cum_end - 1) / $SeqBudget) AS BIGINT) AS last_seq
         |FROM c ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_pack_efficiency" ->
      s"""WITH b AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_len
         |  FROM documents WHERE text IS NOT NULL
         |), c AS (
         |  SELECT doc_id, shard, tok_len,
         |    SUM(tok_len) OVER (PARTITION BY shard
         |      ORDER BY doc_id ASC NULLS LAST
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
         |  FROM b
         |), p AS (
         |  SELECT shard, tok_len,
         |    CAST(floor((cum_end - tok_len) / $SeqBudget) AS BIGINT)
         |      AS first_seq,
         |    CAST(floor((cum_end - 1) / $SeqBudget) AS BIGINT) AS last_seq
         |  FROM c
         |)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(tok_len) AS BIGINT) AS total_tokens,
         |  CAST(MAX(last_seq) + 1 AS BIGINT) AS n_seqs,
         |  CAST(COUNT(CASE WHEN first_seq <> last_seq THEN 1 END)
         |    AS BIGINT) AS n_split_docs,
         |  CAST((MAX(last_seq) + 1) * $SeqBudget AS BIGINT) AS capacity,
         |  CAST(SUM(tok_len) AS DOUBLE)
         |    / ((MAX(last_seq) + 1) * $SeqBudget) AS fill_rate
         |FROM p GROUP BY shard
         |ORDER BY shard ASC NULLS LAST""".stripMargin,

    "q_text_chunk" ->
      s"""WITH b AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents WHERE text IS NOT NULL
         |), x AS (
         |  SELECT doc_id, toks, n_toks,
         |    unnest(generate_series(0,
         |      CAST(floor((n_toks - 1) / $ChunkStride) AS BIGINT)))
         |      AS chunk_id
         |  FROM b
         |)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(chunk_id * $ChunkStride AS BIGINT) AS tok_start,
         |  CAST(least($ChunkSize, n_toks - chunk_id * $ChunkStride)
         |    AS BIGINT) AS chunk_len,
         |  list_aggr(list_slice(toks, chunk_id * $ChunkStride + 1,
         |    least(chunk_id * $ChunkStride + $ChunkSize, n_toks)),
         |    'string_agg', ' ') AS chunk_text
         |FROM x
         |ORDER BY doc_id ASC NULLS LAST, chunk_id ASC NULLS LAST"""
        .stripMargin
  )
}
