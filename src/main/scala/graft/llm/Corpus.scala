package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end corpus cleaning (SURVEY.md §2.D21) — the composition a
  * training-data pipeline actually runs, assembled from the engine's own
  * operators: keep a document iff it is
  *   (1) the exact-dedup keeper of its normalized text (D1),
  *   (2) not a dropped member of a MinHash near-dup cluster (D19 —
  *       cluster keeper survives),
  *   (3) not contaminated against the benchmark set (D20), and
  *   (4) above the quality-score floor (D9).
  * Every stage is a semi/anti join against a bounded key set — the
  * documents scan happens once per stage input, nothing is collected,
  * and each underlying operator keeps its own bucketed/broadcast shape.
  * (The benchmark stand-in docs themselves pass through: decontamination
  * only filters the rest of the corpus against them.)
  */
object Corpus {

  val QualityFloor = 0.45

  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val q = TextOps.textQuality(spark, dir).select(col("doc_id"), col("quality_score"))
    val exactKeep = Dedup.dedupExact(spark, dir).select(col("keeper_id").as("doc_id"))
    val ccDrop = Dedup.dedupComponents(spark, dir)
      .filter(!col("is_keeper")).select("doc_id")
    val contam = Dedup.decontaminate(spark, dir)
      .filter(col("contaminated")).select("doc_id")
    Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(ccDrop, Seq("doc_id"), "left_anti")
      .join(contam, Seq("doc_id"), "left_anti")
      .join(q, Seq("doc_id"))
      .filter(col("quality_score") >= QualityFloor)
      .select(col("doc_id"), col("lang"),
        round(col("quality_score"), 4).as("quality_score"))
  }

  val corpusCleanSql: String =
    s"""WITH q AS (SELECT doc_id, quality_score FROM (${TextOps.textQualitySql}) t),
    exact_keep AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id, md5(${TextOps.normTextSql}) AS th FROM documents)
      GROUP BY th),
    cc_drop AS (
      SELECT doc_id FROM (${Dedup.dedupComponentsSql}) c
      WHERE NOT is_keeper),
    contam AS (
      SELECT doc_id FROM (${Dedup.decontaminateSql}) d WHERE contaminated)
    SELECT d.doc_id, d.lang, round(q.quality_score, 4) AS quality_score
    FROM documents d
    JOIN q ON q.doc_id = d.doc_id
    WHERE d.doc_id IN (SELECT doc_id FROM exact_keep)
      AND d.doc_id NOT IN (SELECT doc_id FROM cc_drop)
      AND d.doc_id NOT IN (SELECT doc_id FROM contam)
      AND q.quality_score >= $QualityFloor"""

  /** D27: corpus report ("dataset card") — per (source, lang): doc count,
    * total BPE-ish tokens, mean quality, exact median token count. ONE
    * scan computes every per-doc feature as a projection (same expression
    * shapes text_quality / text_tokens hash-check — no join of derived
    * frames), then ONE shuffle by (source, lang) serves both the median
    * window and the aggregate. Mean quality goes through integer
    * micro-units (round(q*1e6) summed as BIGINT) so the group sum is
    * order-independent — the report's numbers are exact, not
    * float-accumulation-dependent.
    */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = TextOps.toks(col("text"))
    val nTokens = size(t)
    val nChars = length(col("text"))
    val nPunct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
    val nStop = TextOps.stopCount(t, TextOps.StopEn)
    val stopRatio = when(nTokens === 0, 0.0).otherwise(nStop.cast("double") / nTokens)
    val punctRatio = when(nChars === 0, 0.0).otherwise(nPunct.cast("double") / nChars)
    val quality = stopRatio * 0.5 + (lit(1.0) - punctRatio) * 0.3 +
      least(nTokens.cast("double") / 100, lit(1.0)) * 0.2
    val nBpe = size(regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
    val perDoc = Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"),
        nBpe.as("n_bpe_tokens"),
        round(quality * 1000000).cast("bigint").as("q_micros"))
    val w = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("n_bpe_tokens").asc, col("doc_id").asc)
    val wp = Window.partitionBy(col("source"), col("lang"))
    perDoc
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wp))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens")).as("total_tokens"),
        (sum(col("q_micros")).cast("double") /
          (count(lit(1)) * lit(1000000.0))).as("mean_quality"),
        max(when(col("rn") === expr("(n-1) div 2 + 1"), col("n_bpe_tokens")))
          .cast("bigint").as("median_tokens"))
  }
  val corpusReportSql: String =
    s"""WITH per_doc AS (
      SELECT doc_id, source, lang,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
        CAST(round((
          (CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(${TextOps.stopCountSql("toks", TextOps.StopEn)} AS DOUBLE) / len(toks) END) * 0.5
          + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 0.3
          + least(CAST(len(toks) AS DOUBLE) / 100, 1.0) * 0.2
        ) * 1000000, 0) AS BIGINT) AS q_micros
      FROM (SELECT doc_id, source, lang, text, ${TextOps.toksSql} AS toks FROM documents)),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY source, lang
                                   ORDER BY n_bpe_tokens ASC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY source, lang) AS n
      FROM per_doc)
    SELECT source, lang, count(*) AS n_docs,
      CAST(sum(n_bpe_tokens) AS BIGINT) AS total_tokens,
      CAST(sum(q_micros) AS DOUBLE) / (count(*) * 1000000.0) AS mean_quality,
      CAST(max(CASE WHEN rn = (n - 1) // 2 + 1 THEN n_bpe_tokens END) AS BIGINT) AS median_tokens
    FROM w GROUP BY source, lang"""
}
