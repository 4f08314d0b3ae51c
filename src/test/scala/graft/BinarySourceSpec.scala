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
}
