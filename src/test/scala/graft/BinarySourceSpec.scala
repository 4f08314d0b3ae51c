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

  /** Committed codec fixtures (src/test/resources/media, generated once
    * with javax.imageio from the analytic pattern pixel(id,x,y) =
    * (id·31+7x+13y) mod 256): the REAL-decode ground truth is pinned as
    * literals recorded at generation time, so a regression in the decode
    * path (or a silently rewritten fixture) fails here — nothing is
    * re-derived from the code under test.
    */
  private val fixtureDir = getClass.getResource("/media").getPath
  private val pngTruth = Map( // name -> (w, h, px_sum, px00)
    101L -> (16, 12, 30016L, 59),
    202L -> (9, 7, 11655L, 118),
    303L -> (1, 1, 177L, 177))

  private def fixtureBins(glob: String) = {
    import Multimodal.MediaBin
    BinarySource.readMediaDir(spark, fixtureDir, Some(glob))
      .select(
        regexp_extract(col("path"), "fix_(\\d+)\\.", 1).cast("long").as("media_id"),
        col("content").as("payload"))
      .as[MediaBin]
  }

  test("real decode: committed PNG fixtures through BinarySource match pinned pixel truth") {
    val got = Multimodal.decodeImageFeatures(fixtureBins("*.png")).collect()
      .map(d => d.media_id -> ((d.img_w, d.img_h, d.px_sum, d.px00))).toMap
    assert(got === pngTruth,
      s"ImageIO decode diverged from generation-time ground truth: $got")
  }

  test("real decode: committed JPEG fixture — dims pinned, pixels match direct ImageIO") {
    val got = Multimodal.decodeImageFeatures(fixtureBins("*.jpg")).collect()
    assert(got.length === 1)
    val d = got.head
    assert((d.img_w, d.img_h) === (16, 12), "JPEG dims must decode")
    // lossy codec: engine path must equal an in-process direct ImageIO read
    // of the same committed bytes (proves BinarySource → mapPartitions →
    // decoder is byte-faithful; PNG pins the absolute truth above)
    val img = javax.imageio.ImageIO.read(
      new java.io.File(fixtureDir + "/fix_404.jpg"))
    var sum = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      sum += img.getRGB(x, y) & 0xff
    assert(d.px_sum === sum && d.px00 === (img.getRGB(0, 0) & 0xff))
  }

  test("real decode fails open: undecodable bytes degrade to a (-1,-1) row") {
    import Multimodal.MediaBin
    val junk = Seq(MediaBin(7L, Array[Byte](1, 2, 3, 4))).toDS()
    val got = Multimodal.decodeImageFeatures(junk).collect()
    assert(got.toSeq === Seq(Multimodal.DecodedImage(7L, -1, -1, 0L, -1)))
  }

  test("real round trip: engine-synthesized PNGs decode to the analytic pattern") {
    val decoded = Multimodal.decodeImageFeatures(
      Multimodal.synthPngFrame(spark, sfDir)).collect()
    val meta = Tables.documents(spark, sfDir)
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)))
      .as[(Long, Long)].collect().toMap
    assert(decoded.nonEmpty && decoded.length === meta.size)
    decoded.foreach { d =>
      val (w, h) = Multimodal.patternDims(meta(d.media_id))
      assert((d.img_w, d.img_h) === (w, h), s"dims(${d.media_id})")
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += Multimodal.patternPixel(d.media_id, x, y)
      assert(d.px_sum === sum, s"px_sum(${d.media_id})")
    }
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
