package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic stratified sampling for corpus rebalancing (SURVEY.md
  * §2.D13): per-language keep rates applied via a content-keyed hash
  * bucket, the standard way a training-data pipeline downsamples
  * over-represented languages.
  *
  * Scale posture: the sampler is a stateless map-side filter — no shuffle,
  * no RNG state, no driver coordination — so it composes with any scan and
  * survives retries/re-partitioning bit-identically (the hash is a pure
  * function of (doc_id, lang), unlike `df.sample`, whose per-partition seed
  * stream changes under repartitioning).
  */
object Sampling {

  /** Percent of docs kept per language; languages absent keep everything.
    * en is over-represented in the corpus (≈44%) → keep 25%; es → 50%.
    */
  val Rates: Seq[(String, Int)] = Seq("en" -> 25, "es" -> 50)
  val DefaultRate = 100

  /** Uniform 0-99 bucket from md5(doc_id:lang) — same formula the oracle
    * recomputes, so the sample set is engine-independent. A null lang
    * hashes as the empty string in BOTH engines (concat_ws would silently
    * drop the separator; '||' would null-propagate — coalesce pins one
    * behavior everywhere).
    */
  def bucket(docId: Column, lang: Column): Column =
    conv(substring(md5(
      concat(docId.cast("string"), lit(":"), coalesce(lang, lit("")))), 1, 6), 16, 10)
      .cast("bigint") % 100

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = Rates.foldRight(lit(DefaultRate): Column) {
      case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket(col("doc_id"), col("lang")))
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("bucket"))
  }

  val sampleStratifiedSql: String = {
    val cases = Rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")
    s"""SELECT * FROM (
      SELECT doc_id, lang, source, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || coalesce(lang, '')), 1, 6)
                  AS BIGINT) % 100 AS bucket
      FROM documents) t
    WHERE bucket < (CASE $cases ELSE $DefaultRate END)"""
  }
}
