package graft

import org.apache.spark.sql.functions._
import graft.sources.SizedSink

/** Target-size writer: file count must track ceil(bytes/target) and every
  * data file must land in a band around the target even when the INPUT
  * partitioning is maximally skewed (the compaction use case).
  */
class SizedSinkSpec extends SparkSpecBase {

  private def sizesOf(path: String): Seq[Long] =
    SizedSink.dataFiles(path).map(java.nio.file.Files.size(_))

  test("skewed input compacts into target-band files") {
    // skew the layout on purpose: everything in ONE partition
    val docs = Tables.documents(spark, sfDir).repartition(1)
    val out = java.nio.file.Files.createTempDirectory("sized_out_").toString
    val target = 8 * 1024L // 8 KB targets: spec corpus is ~64 KB of parquet
    val nFiles = SizedSink.writeSized(spark, docs, out, target)
    val sizes = sizesOf(out)
    assert(sizes.size == nFiles)
    assert(nFiles > 1, "spec corpus should need several 8KB files")
    // estimator band: sampled bytes/row extrapolates the total, so allow
    // 2.5x headroom above and 0.3x below (per-file encoder overhead and
    // row-group rounding dominate at KB scale)
    sizes.foreach { s =>
      assert(s <= (target * 2.5).toLong && s >= (target * 0.3).toLong,
        s"file size $s outside band for target $target (all: $sizes)")
    }
    // round-trip: no rows lost to the re-layout
    assert(SizedSink.read(spark, out).count() == docs.count())
  }

  test("empty input writes cleanly, single file") {
    val empty = Tables.documents(spark, sfDir).filter(lit(false))
    val out = java.nio.file.Files.createTempDirectory("sized_empty_").toString
    val nFiles = SizedSink.writeSized(spark, empty, out, 1024 * 1024)
    assert(nFiles == 1)
    assert(SizedSink.read(spark, out).count() == 0)
  }

  test("larger target means fewer files") {
    val docs = Tables.documents(spark, sfDir)
    val outA = java.nio.file.Files.createTempDirectory("sized_a_").toString
    val outB = java.nio.file.Files.createTempDirectory("sized_b_").toString
    val small = SizedSink.writeSized(spark, docs, outA, 4 * 1024)
    val large = SizedSink.writeSized(spark, docs, outB, 64 * 1024)
    assert(small > large, s"4KB target wrote $small files, 64KB wrote $large")
  }
}
