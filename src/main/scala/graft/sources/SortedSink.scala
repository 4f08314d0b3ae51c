package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Range-clustered parquet sink — the third layout lever next to directory
  * partitioning (PartitionedSink: low-cardinality equality filters) and
  * bucketing (BucketedSink: high-cardinality join/group keys): cluster the
  * table by a RANGE-filtered column (timestamps, prices, ids scanned by
  * interval). `repartitionByRange` + `sortWithinPartitions` makes every
  * output file own a disjoint slice of the key space, so each file's
  * parquet footer min/max brackets a narrow range and a range predicate
  * prunes whole files (and row groups within them) at planning time —
  * the single-dimension version of what Z-ordering does for several.
  *
  * The range exchange samples the key distribution, so skewed keys still
  * yield balanced files — unlike static bucketing on a skewed range key.
  */
object SortedSink {

  /** Write `df` range-clustered by `cols` into `numFiles` files with
    * pairwise-disjoint key ranges (globally sorted across files).
    */
  def writeSorted(df: DataFrame, path: String, cols: Seq[String],
                  numFiles: Int): Unit = {
    val keys: Seq[Column] = cols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }

  def readSorted(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
