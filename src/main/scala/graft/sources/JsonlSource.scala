package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format LLM training corpora
  * actually ship in (one JSON document per line, splittable, append-only).
  *
  * Scale posture: JSONL is line-splittable, so a 100 TB corpus directory
  * parallelizes like any text source (`maxPartitionBytes` splits); schema
  * is LOCKED by the caller (or probed once from a bounded sample) so a
  * drifting producer can't silently widen the scan, and bad lines land in
  * `_corrupt_record` instead of failing the job (PERMISSIVE — the same
  * fail-open posture as the reference's CSV ingest).
  */
object JsonlSource {

  /** Distributed JSONL write; `singleFile` mirrors the reference's
    * one-downloadable-file path (coalesce only at dim scale).
    */
  def writeJsonl(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }

  /** Read JSONL with a caller-locked schema, or infer when absent
    * (inference samples the data once — lock the schema in production).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema.map(base.schema).getOrElse(base).json(path)
  }
}
