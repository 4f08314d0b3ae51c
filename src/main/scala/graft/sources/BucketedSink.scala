package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet table sink — the production answer to the shuffles the
  * capex pipeline pays on RequestNo and every repeated key join/window
  * (SURVEY.md §5): write the fact ONCE clustered by the hot key, and every
  * downstream groupBy/join/window on that key reads pre-partitioned data
  * with NO exchange (FileSourceScanExec reports the bucket spec as its
  * outputPartitioning, so Catalyst drops the Exchange; with sortBy and one
  * file per bucket the sort is free too).
  *
  * At 100 TB the write is one full shuffle paid once; every subsequent run
  * of the 19-rule pipeline, the representative-row window, fail-open key
  * aggregation, or a co-bucketed join then runs exchange-free. Bucket count
  * is chosen like shuffle partitions: 2-3× total cores, sized so one bucket
  * fits an executor's working memory.
  */
object BucketedSink {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed parquet
    * table. `saveAsTable` is required — bucket metadata lives in the
    * catalog, not the files.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** path:size:mtime fingerprint of the files under `paths` (plain files or
    * parquet directories) — folded into persisted-table names so rewriting
    * a dataset in place invalidates the cached table instead of silently
    * serving stale data.
    */
  def contentFingerprint(paths: Seq[String]): String = {
    import java.nio.file.{Files, Paths}
    paths.flatMap { s =>
      val p = Paths.get(s)
      if (!Files.exists(p)) Seq(s"$s:absent")
      else if (Files.isDirectory(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => s"$f:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
          .toSeq.sorted
        finally walk.close()
      } else Seq(s"$p:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
    }.mkString("\n")
  }

  /** MD5 of `seed`, hex, truncated — table-name suffix for fingerprints. */
  def nameHash(seed: String, len: Int = 16): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(len)

  /** Run `write` only if `table` is absent from the catalog, first clearing
    * an orphaned warehouse location (the in-memory catalog forgets tables
    * between JVMs but warehouse files persist — a leftover directory would
    * fail the CTAS). Returns the table name.
    */
  def ensureTable(spark: SparkSession, table: String)(write: => Unit): String = {
    if (!spark.catalog.tableExists(table)) {
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(loc)
        try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
      write
    }
    table
  }
}
