package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet sink — the MULTI-column data-
  * skipping lever completing the layout family (PartitionedSink: equality
  * on low-cardinality; BucketedSink: join/group keys; SortedSink: ONE range
  * dimension). Interleaving the bits of two normalized key columns gives a
  * space-filling-curve code whose contiguous ranges are compact 2-D
  * regions, so clustering files by the code makes EVERY file's parquet
  * footer min/max narrow on BOTH columns at once — a rectangle predicate
  * (`a BETWEEN … AND b BETWEEN …`) prunes whole files on either or both
  * dimensions, where a plain sort serves only its leading column.
  *
  * Scale shape: one tiny bounds aggregate (2 rows of min/max, broadcast
  * back), a pure codegen'd normalize+interleave projection, then the same
  * `repartitionByRange` + `sortWithinPartitions` as SortedSink — the range
  * exchange SAMPLES the code distribution, so file sizes stay balanced
  * even when the value distribution is skewed (skew degrades only locality
  * tightness, never balance). No shuffle beyond the one clustering
  * exchange any clustered write needs.
  */
object ZOrderSink {

  /** Per-dimension resolution: 2^ZBits cells per column; 12 bits → a
    * 24-bit Morton code, far finer than any realistic file count.
    */
  val ZBits = 12

  private val MaxCell: Int = (1 << ZBits) - 1

  /** Interleave the low ZBits of nx (even positions) and ny (odd). */
  private def morton(nx: Column, ny: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(nx.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(ny.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Write `df` Z-order-clustered by numeric columns (cx, cy) into
    * `numFiles` files. The temp columns never reach the files.
    */
  def writeZOrdered(df: DataFrame, path: String, cx: String, cy: String,
                    numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(cx).cast("double")).as("x_lo"), max(col(cx).cast("double")).as("x_hi"),
      min(col(cy).cast("double")).as("y_lo"), max(col(cy).cast("double")).as("y_hi"))
    def cell(v: Column, lo: Column, hi: Column): Column =
      least(lit(MaxCell.toLong), greatest(lit(0L),
        floor((v.cast("double") - lo) / greatest(hi - lo, lit(1e-12)) * MaxCell)
          .cast("long")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", morton(
        cell(col(cx), col("x_lo"), col("x_hi")),
        cell(col(cy), col("y_lo"), col("y_hi"))))
      .drop("x_lo", "x_hi", "y_lo", "y_hi")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def readZOrdered(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
