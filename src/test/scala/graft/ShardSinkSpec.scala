package graft

import org.apache.spark.sql.functions._
import graft.sources.ShardSink
import java.nio.file.Files

/** F11: shard export — deterministic membership, every shard present,
  * balanced sizes, exact round-trip.
  */
class ShardSinkSpec extends SparkSpecBase {

  private val Shards = 8

  test("shard export: deterministic, complete, balanced, round-trips") {
    val out = Files.createTempDirectory("graft-shards").toString
    val docs = Tables.documents(spark, sfDir)
    ShardSink.writeShards(docs, out, "doc_id", Shards)
    val back = ShardSink.readShards(spark, out)
    // exact round-trip of the data columns
    assert(back.count() === docs.count())
    assert(back.drop("shard").exceptAll(docs).count() === 0)
    // every shard materialized, sizes within a sane band of the mean
    val sizes = back.groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet === (0 until Shards).toSet)
    val mean = docs.count().toDouble / Shards
    sizes.values.foreach(n => assert(n > mean * 0.5 && n < mean * 1.5,
      s"shard imbalance: $sizes"))
    // membership is content-keyed: recomputing the id matches the layout
    assert(back.filter(
      ShardSink.shardId(col("doc_id"), Shards) =!= col("shard")).count() === 0)
    // re-export lands every row in the same shard (retry-stable)
    val out2 = Files.createTempDirectory("graft-shards2").toString
    ShardSink.writeShards(docs, out2, "doc_id", Shards)
    val again = ShardSink.readShards(spark, out2)
    assert(again.exceptAll(back).count() === 0)
  }
}
