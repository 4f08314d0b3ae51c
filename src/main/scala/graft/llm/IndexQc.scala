package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocking-structure occupancy QC (SURVEY §2 D69).
  *
  * The r7 verdict's central scale critique was invisible to every row-level
  * gate: a blocking scheme whose bucket UNIVERSE is a constant (256 simhash
  * band values, 16 LSH band keys) stays green at sf0.1 while its per-bucket
  * occupancy — and therefore its candidate-join volume Σ c·(c−1)/2 — grows
  * quadratically with the corpus. The r8 width configs (`graft.simhash
  * .blocks`, `graft.ann.*`) are the lever; THIS operator is the gauge: for
  * each candidate-generating structure the engine ships (minhash LSH bands,
  * embedding hyperplane-LSH bands, simhash Manku block-combos) plus the two
  * SERVING structures (the 2^NumPlanes ann_lsh single-table buckets and the
  * refined IVF cells), one row per block with the distinct-key count, row
  * count, largest bucket, and the exact pre-confirm candidate-pair volume
  * the bucket self-join would generate. An operator reads this at ingest
  * scale and raises the width BEFORE the join runs, instead of discovering
  * a 10¹⁵-pair stage at hour six of a 100 TB pass; for the serving
  * structures, max_bucket IS the worst-case probe fan-in and the cell-size
  * spread is IVF probe-latency skew.
  *
  * Scale shape: per family one partial-agg shuffle keyed by (block, key)
  * (map-side combinable counts), then a block-bounded second aggregate —
  * strictly linear, the observability pass is never more expensive than
  * the join it guards. Output is bounded by Bands + EmbBands + C(b, b−6)
  * rows. All-integer → hash-checked against an oracle that mirrors each
  * structure's key derivation verbatim (for simhash that is the ENGINE's
  * combo layout, not the pair oracle's independent blocking: occupancy is
  * a statement about the engine's own buckets).
  */
object IndexQc {

  /** Per-block stats over (block_idx, bkey) bucket rows. */
  private def occStats(rows: DataFrame, family: String): DataFrame =
    rows.groupBy(col("block_idx"), col("bkey"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bp", expr("c * (c - 1) div 2"))
      .groupBy(col("block_idx"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_bucket"), sum(col("bp")).as("cand_pairs"))
      .select(lit(family).as("family"),
        col("block_idx").cast("int").as("block_idx"),
        col("n_keys"), col("n_rows"), col("max_bucket"), col("cand_pairs"))

  def indexOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val mh = Dedup.minhashSignatures(spark, dir)
      .select(col("band_idx").as("block_idx"), col("band_hash").as("bkey"))
    val emb = Ann.embBandedRows(spark, dir)
      .select(col("band_idx").as("block_idx"),
        col("band_key").cast("string").as("bkey"))
    val sh = Dedup.simhashKeyed(
        Dedup.simhashSignatures(spark, dir), Dedup.simhashBlocks)
      .select(col("combo").as("block_idx"), col("key").cast("string").as("bkey"))
    occStats(mh, "minhash")
      .unionByName(occStats(emb, "emb_lsh"))
      .unionByName(occStats(sh, "simhash"))
      // the two SERVING structures (r8 follow-up): single-block by
      // construction — ann_lsh gauges per-probe bucket occupancy
      // (n/2^NumPlanes), ivf gauges cell imbalance (probe-latency skew and
      // dedup_semantic's within-cell pair volume)
      .unionByName(occStats(Ann.lshBucketRows(spark, dir), "ann_lsh"))
      .unionByName(occStats(Ann.ivfCellRows(spark, dir), "ivf"))
  }

  def indexOccupancySql: String =
    s"""${Dedup.minhashOccupancySql}
    UNION ALL ${Ann.embLshOccupancySql}
    UNION ALL ${Dedup.simhashOccupancySql}
    UNION ALL ${Ann.annLshOccupancySql}
    UNION ALL ${Ann.ivfOccupancySql}"""
}
