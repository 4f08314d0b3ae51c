package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet sink — the layout that makes predicate-
  * by-partition queries free at 100 TB. Where bucketing (BucketedSink)
  * answers "co-locate by a high-cardinality join/group key", directory
  * partitioning answers "prune the scan by a low-cardinality filter column"
  * (language, date, source): a filter on the partition column becomes a
  * directory listing, and Spark reads NONE of the excluded partitions'
  * bytes — the plan shows it as PartitionFilters with PartitionCount
  * scaling with the selected slice, not the table.
  *
  * Partition columns must be low-cardinality (languages, days — not doc
  * ids): each value is a directory, and a high-cardinality partition key
  * melts the filesystem's metadata layer long before 100 TB. Combine both
  * layouts for the full story: partitionBy(date, lang) + bucketBy(doc_id)
  * gives pruned scans AND exchange-free downstream clustering.
  */
object PartitionedSink {

  /** Write `df` partitioned by `cols` (directory-per-value layout). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
