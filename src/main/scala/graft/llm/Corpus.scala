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
}
