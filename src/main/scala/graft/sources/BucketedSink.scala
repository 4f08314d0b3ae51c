package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet table sink — the production answer to the shuffles the
  * capex pipeline pays on RequestNo and every repeated key join/window
  * (SURVEY.md §5): write the fact ONCE clustered by the hot key, and every
  * downstream groupBy/join/window on that key reads pre-partitioned data
  * with NO exchange (FileSourceScanExec reports the bucket spec as its
  * outputPartitioning, so Catalyst drops the Exchange; with sortBy and one
  * file per bucket the sort is free too).
  *
  * At 100 TB the write is one full shuffle paid once; every subsequent run
  * of the 19-rule pipeline, the representative-row window, fail-open key
  * aggregation, or a co-bucketed join then runs exchange-free. Bucket count
  * is chosen like shuffle partitions: 2-3× total cores, sized so one bucket
  * fits an executor's working memory.
  */
object BucketedSink {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed parquet
    * table. `saveAsTable` is required — bucket metadata lives in the
    * catalog, not the files.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
