package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC read/write — the second columnar interchange format next to parquet
  * (warehouses hand analytics engines ORC as often as parquet). Spark's
  * native vectorized ORC reader gives the same scan-level contracts the
  * engine's plan audits demand of parquet: predicate pushdown (PushedFilters
  * reach the stripe/row-group index) and column pruning (ReadSchema), so
  * every operator runs unchanged over an ORC table at the same scan cost.
  */
object OrcSource {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
