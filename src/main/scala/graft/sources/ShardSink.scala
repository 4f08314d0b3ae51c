package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F11: training-shard export — the last step of a data pipeline hands the
  * training stack a directory of uniformly-sized, deterministically
  * assigned shards (data loaders stripe shards across workers, so shard
  * count and balance ARE the training parallelism). Assignment is the
  * content-keyed md5 bucket the engine's sampling family already uses:
  * retry-stable, partitioning-independent, engine-independent — re-running
  * the export yields byte-identical shard membership, so a resumed
  * training run sees the same data order. One keyed exchange by shard, one
  * file per shard via maxRecordsPerFile-free single-partition writes
  * (each shard is its own write partition).
  */
object ShardSink {

  /** Deterministic shard id for a key column: first 15 md5 hex digits
    * (60 bits, sign-safe) mod shards — same construction as
    * Sampling's content-hash filters.
    */
  def shardId(key: org.apache.spark.sql.Column, shards: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("bigint") % shards).cast("int")

  /** Write `df` into exactly `shards` parquet directories
    * (`shard=K/part-*.parquet`), membership keyed by md5(keyCol). The
    * shard column is also retained IN the data so a reader can audit
    * placement against content.
    */
  def writeShards(df: DataFrame, path: String, keyCol: String, shards: Int): Unit =
    df.withColumn("shard", shardId(col(keyCol), shards))
      .repartition(shards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
