package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sequence packing for pretraining-corpus assembly
  * (SURVEY.md §2.D18): concatenate documents in a fixed order and index
  * which fixed-size token window each document starts in — the standard
  * "concat then chunk" layout (documents may cross chunk boundaries).
  *
  * Scale posture: a single global order would serialize into one
  * partition, so packing runs per SHARD — a content-keyed md5 bucket
  * (same idiom as Sampling.bucket) — and the window's running sum
  * clusters by shard: one exchange, PackShards-way parallel, each shard's
  * state is a running long. Sequence ids are (shard, chunk) pairs so
  * shards never coordinate; at 100 TB you raise PackShards to the write
  * parallelism you want and the plan is unchanged.
  */
object Packing {

  val PackBudget = 128L
  val PackShards = 16

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packOfCounts(
      Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
            .cast("bigint").as("n_tokens")))

  /** D59: BPE-budget-exact packing — the same concat-then-chunk layout
    * driven by the ACTUAL tokenizer's counts instead of the whitespace
    * proxy. A model's context budget is denominated in TOKENIZER tokens;
    * the proxy mis-counts per doc by a content-dependent factor, so
    * proxy-packed boundaries drift from the budget the trainer actually
    * enforces — a batch assembler packs on the counts the trainer will
    * see. r13: the counter is the production tokenizer — the BYTE-LEVEL
    * hierarchical encode (BpeHier) — so the budget is honest on any
    * script, not just the ASCII band (the r12 D54 char-level counter
    * cannot see non-ASCII text at all). Scale shape unchanged: the
    * encode is map-side (merge table broadcasts once), packing is the
    * same single shard-clustered window exchange.
    */
  def packSequencesBpe(spark: SparkSession, dir: String): DataFrame =
    packOfCounts(BpeHier.encodedCounts(spark, dir))

  /** Core over any (doc_id, n_tokens) frame. */
  private[graft] def packOfCounts(counts: DataFrame): DataFrame = {
    val shard =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":pack"))), 1, 6), 16, 10)
        .cast("bigint") % PackShards
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("shard", shard)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // the chunk this document STARTS in, and its offset within the chunk
      // (integer `div`, not `/`: Column / is double division and would
      // lose exactness once per-shard running totals pass 2^53)
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $PackBudget"))
      .withColumn("seq_offset", (col("cum") - col("n_tokens")) % PackBudget)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("seq_id"), col("seq_offset"))
  }

  val ChunkSize = 64L
  val ChunkStride = 48L

  /** D38: RAG-style document chunking — split each document's token stream
    * into fixed-size windows with overlap (size 64, stride 48 → 16-token
    * overlap), the retrieval-index preparation step (pack_sequences is the
    * opposite layout: concat-then-chunk ACROSS documents; this chunks
    * WITHIN a document and never crosses doc boundaries). Pure map-side
    * work: tokenize once, explode a chunk-index sequence (fan-out bounded
    * by n_tokens/stride), slice the token array per chunk — zero
    * exchanges over a pre-split input, embarrassingly parallel at 100 TB.
    * Chunk count = 1 + ceil((n−size)/stride) in exact integer arithmetic
    * (one chunk when n ≤ size; a null text degrades to zero rows), so
    * both engines enumerate identical windows.
    */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    // fence, not cp: the token array feeds four consumers (size, explode
    // bound, slice, least) in a LINEAR pipeline — without a barrier
    // CollapseProject re-inlines the tokenizer into each, re-tokenizing
    // every doc once per CHUNK row; with no reuse across plans a
    // materializing checkpoint would be pure overhead (see plans.Fence)
    graft.plans.Fence(
      Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("toks")))
      .withColumn("n", size(col("toks")).cast("bigint"))
      .withColumn("n_chunks",
        when(col("n") <= ChunkSize, lit(1L))
          .otherwise(lit(1L) + expr(s"(n - $ChunkSize + $ChunkStride - 1) div $ChunkStride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(ChunkSize), col("n") - col("chunk_idx") * ChunkStride).as("chunk_tokens"),
        array_join(
          slice(col("toks"), (col("chunk_idx") * ChunkStride + 1).cast("int"),
            lit(ChunkSize.toInt)), " ").as("chunk_text"))

  val chunkDocumentsSql: String =
    s"""WITH d AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
      FROM documents),
    c AS (
      SELECT doc_id, toks, n,
        CASE WHEN n <= $ChunkSize THEN 1
             ELSE 1 + (n - $ChunkSize + $ChunkStride - 1) // $ChunkStride END AS n_chunks
      FROM d),
    e AS (
      SELECT doc_id, toks, n,
        unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM c)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      CAST(least($ChunkSize, n - chunk_idx * $ChunkStride) AS BIGINT) AS chunk_tokens,
      array_to_string(list_slice(toks, chunk_idx * $ChunkStride + 1,
        least(chunk_idx * $ChunkStride + $ChunkSize, n)), ' ') AS chunk_text
    FROM e"""

  val packSequencesSql: String =
    s"""SELECT doc_id, shard, n_tokens,
      CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS seq_id,
      CAST((cum - n_tokens) % $PackBudget AS BIGINT) AS seq_offset
    FROM (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 6)
                    AS BIGINT) % $PackShards AS shard,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
        FROM documents))"""

  /** D59 oracle: the identical pack window over the byte-level
    * hierarchical encode's counts (BpeHier's full train+encode replay
    * nests as a subquery — DuckDB allows WITH RECURSIVE inside a derived
    * table).
    */
  def packSequencesBpeSql: String =
    s"""SELECT doc_id, shard, n_tokens,
      CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS seq_id,
      CAST((cum - n_tokens) % $PackBudget AS BIGINT) AS seq_offset
    FROM (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 6)
                    AS BIGINT) % $PackShards AS shard,
               n_tokens
        FROM (${BpeHier.encodedCountsSql}) enc))"""

  /** D72: packing-efficiency QC — per (counter, shard), the accounting a
    * batch assembler reads before committing a packed corpus: doc/token
    * totals, chunk count, tail padding (the only padding concat-then-chunk
    * ever wastes — the final partial chunk per shard), and fragmentation
    * (docs that straddle a chunk boundary, and the total number of
    * boundary crossings — each crossing is a doc split across training
    * sequences, the rows attention masking has to handle). Emitted for
    * BOTH packers — the whitespace proxy (D18) and the tokenizer-true BPE
    * layout (D59) — because the comparison is the point: the two layouts
    * fragment differently for the same corpus, and this table is where
    * that shows up as numbers rather than as a training-time surprise.
    *
    * Derivations are pure integer arithmetic on the pack outputs
    * (seq_offset, n_tokens): a doc crosses iff seq_offset + n_tokens > B,
    * and its crossing count is (seq_offset + n_tokens - 1) div B — exact
    * because cum = seq_id*B + seq_offset + n_tokens per shard. Shape: the
    * two pack windows are the operators' own ONE-exchange plans; the
    * per-shard aggregate partially combines map-side into PackShards
    * groups (2 x 16 output rows), so the add-on cost at 100 TB is a
    * shards-bounded aggregate over frames already clustered by shard.
    * 10000 * total_tokens stays under 2^63 until ~9e14 tokens/shard —
    * raise PackShards long before that.
    */
  def packEfficiency(spark: SparkSession, dir: String): DataFrame =
    packStatsOf(packSequences(spark, dir), "ws")
      .unionByName(packStatsOf(packSequencesBpe(spark, dir), "bpe"))

  private def packStatsOf(pack: DataFrame, counter: String): DataFrame =
    pack.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("seq_offset") + col("n_tokens") > PackBudget, 1L)
          .otherwise(0L)).as("crossing_docs"),
        sum(when(col("n_tokens") > 0,
            expr(s"(seq_offset + n_tokens - 1) div $PackBudget"))
          .otherwise(0L)).as("boundary_crossings"))
      .withColumn("n_chunks",
        expr(s"(total_tokens + ${PackBudget - 1}) div $PackBudget"))
      .withColumn("tail_padding",
        expr(s"($PackBudget - total_tokens % $PackBudget) % $PackBudget"))
      .withColumn("utilization_bp",
        when(col("n_chunks") > 0,
          expr(s"(10000 * total_tokens) div (n_chunks * $PackBudget)")))
      .select(lit(counter).as("counter"), col("shard"), col("n_docs"),
        col("total_tokens"), col("n_chunks"), col("tail_padding"),
        col("crossing_docs"), col("boundary_crossings"), col("utilization_bp"))

  /** D72 oracle: the identical integer derivations over each pack
    * statement's own output (every output column CAST — DuckDB's SUM over
    * BIGINT widens to HUGEINT). */
  def packEfficiencySql: String = {
    def stats(sub: String, counter: String) =
      s"""SELECT '$counter' AS counter, shard,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST((SUM(n_tokens) + ${PackBudget - 1}) // $PackBudget AS BIGINT) AS n_chunks,
        CAST(($PackBudget - SUM(n_tokens) % $PackBudget) % $PackBudget AS BIGINT) AS tail_padding,
        CAST(SUM(CASE WHEN seq_offset + n_tokens > $PackBudget THEN 1 ELSE 0 END) AS BIGINT) AS crossing_docs,
        CAST(SUM(CASE WHEN n_tokens > 0 THEN (seq_offset + n_tokens - 1) // $PackBudget ELSE 0 END) AS BIGINT) AS boundary_crossings,
        CASE WHEN SUM(n_tokens) > 0 THEN
          CAST((10000 * SUM(n_tokens)) // (((SUM(n_tokens) + ${PackBudget - 1}) // $PackBudget) * $PackBudget) AS BIGINT)
        ELSE CAST(NULL AS BIGINT) END AS utilization_bp
      FROM ($sub) p GROUP BY shard"""
    s"${stats(packSequencesSql, "ws")} UNION ALL ${stats(packSequencesBpeSql, "bpe")}"
  }
}
