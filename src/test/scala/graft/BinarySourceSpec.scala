package graft

import org.apache.spark.sql.functions._
import graft.sources.BinarySource
import graft.llm.Multimodal
import java.nio.file.Files

/** F10: binaryFile media ingestion — files land byte-identical, the glob
  * prunes at listing time, and the adapted frame drives the Multimodal
  * decode plumbing end-to-end.
  */
class BinarySourceSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val mediaDir: String = {
    val dir = Files.createTempDirectory("graft-media")
    val payloads = Map(
      "a.img" -> Array[Byte](0x42, 0x4d, 7, 9),
      "b.img" -> Array[Byte](-1, -40, -1),     // 0xff 0xd8 0xff
      "skip.txt" -> "not media".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(dir.resolve(name), bytes)
    }
    dir.toString
  }

  test("payloads arrive byte-identical; glob prunes foreign files") {
    val files = BinarySource.readMediaDir(spark, mediaDir, Some("*.img"))
      .select(col("path"), col("length"), col("content"))
      .collect()
    assert(files.length === 2, "glob must keep only *.img")
    files.foreach { r =>
      val content = r.getAs[Array[Byte]]("content")
      assert(r.getAs[Long]("length") === content.length)
      val expected = Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(r.getAs[String]("path"))))
      assert(content.toSeq === expected.toSeq, "payload must be untouched")
    }
  }

  test("ingested frame drives the multimodal decode end-to-end") {
    val media = BinarySource.toMediaFrame(
        BinarySource.readMediaDir(spark, mediaDir, Some("*.img")))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 2)
    // first_byte and n_bytes reflect the real payload bytes
    assert(feats.map(_.n_bytes).sorted.toSeq === Seq(3, 4))
    assert(feats.map(_.first_byte).toSet === Set(0x42, 0xff))
    // ids are deterministic across re-ingest (path-keyed)
    val again = Multimodal.decodeFeatures(BinarySource.toMediaFrame(
      BinarySource.readMediaDir(spark, mediaDir, Some("*.img")))
      .as[Multimodal.MediaRow]).collect()
    assert(again.map(_.media_id).toSet === feats.map(_.media_id).toSet)
  }

  test("mm_dedup collapses byte-identical payloads to one keeper") {
    // duplicate payload under a different id: the digest group must fold
    // both rows onto the min-id keeper with n_copies 2
    val rows = Seq(
      (1L, Array[Byte](9, 9, 9), 10, 10),
      (2L, Array[Byte](9, 9, 9), 20, 20),   // byte-identical to id 1
      (3L, Array[Byte](1, 2), 30, 30)).toDF("media_id", "payload", "width", "height")
    val out = rows
      .select(col("media_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .groupBy(col("payload_md5"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"), max(col("n_bytes")).as("n_bytes"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(1L -> (2L, 3L), 3L -> (1L, 2L)))
    // and on the documents-backed frame: copies sum to the corpus size,
    // every keeper is a member of its own digest group
    val t = Multimodal.mmDedup(spark, sfDir)
    val total = Tables.documents(spark, sfDir).count()
    assert(t.agg(sum("n_copies")).head.getLong(0) === total)
    assert(t.filter(col("keeper_id").isNull).count() === 0)
  }
}
