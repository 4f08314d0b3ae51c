package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata layout: one parquet per table
  * under a scale-factor directory (see /root/repo/TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps predicate
  * pushdown / column pruning; at cluster scale the same call reads a
  * partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.ts arrives as parquet TIMESTAMP(MICROS) (reads natively as
    * timestamp_ntz) in current testdata drops, but earlier drops used
    * TIMESTAMP(NANOS), which Spark 4 refuses natively. Probe the read
    * schema: when nanos surface as long (via nanosAsLong), rebuild a micros
    * NTZ timestamp (the testdata has no sub-microsecond components, so this
    * is lossless and matches DuckDB's TIMESTAMP view of the same column);
    * when the column is already session-free NTZ, pass it through. Any
    * OTHER type throws: a TIMESTAMP_LTZ drop (isAdjustedToUTC=true) would
    * cast "successfully" but shift by the session timezone and silently
    * hash-mismatch against DuckDB's wall-clock view — a bad testdata drop
    * must fail fast at the loader, not as a downstream diff.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val tsCol = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case TimestampNTZType => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet type $other (expected NANOS-as-long " +
          "or TIMESTAMP_NTZ); an LTZ column would shift by session timezone")
    }
    raw.withColumn("ts", tsCol)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Spread a frame across every core before CPU-bound per-row compute.
    * The testdata ships one small parquet file per table → one scan
    * partition → one busy core, so expression-heavy operators must
    * explicitly repartition. Keyed (not round-robin) so the spread can
    * satisfy a downstream clustering on the same key. At cluster scale a
    * big table arrives multi-partition and this is one row-light shuffle.
    */
  def spread(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))
  }

  /** spread() only when the scan is narrower than half the cores — on a
    * cluster a big table arrives as many splits and this is a no-op, while
    * the single-file local testdata gets its map-side work parallelized.
    * (Partition count comes from the planned scan, no data is read.)
    */
  def spreadIfNarrow(df: DataFrame, key: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par / 2) spread(df, key) else df
  }
}
