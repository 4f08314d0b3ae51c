package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

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

  /** Tombstone-table name for a persisted index table. */
  def tombTableOf(table: String): String = table + "_tomb"

  /** Record deletions against a persisted index: append the (single-column)
    * key frame to the index's tombstone table, creating it on first use.
    * Idempotent under redelivery — already-recorded keys anti-join away, so
    * a retried takedown batch appends nothing. Tombstones are the
    * contract-bounded small side of every serving read (a takedown list,
    * not a corpus), which is why `readServing` may broadcast them
    * statically per the §5 bounded-side rule.
    */
  def appendTombstones(spark: SparkSession, table: String, keys: DataFrame): Unit = {
    val tt = tombTableOf(table)
    val k = keys.distinct()
    ensureTable(spark, tt) {
      k.limit(0).write.format("parquet").saveAsTable(tt)
    }
    k.join(spark.table(tt), k.columns.toSeq, "left_anti").write.insertInto(tt)
  }

  /** Serving view of a persisted index: the stored table minus its
    * tombstones (broadcast anti-join on `keyCol`). A broadcast LeftAnti
    * preserves the streamed side's output partitioning, so a downstream
    * join on the bucket key still consumes the bucketed layout with NO
    * index-side Exchange — deletion costs a bounded broadcast, never the
    * layout (spec-proven by IndexTombstoneSpec). With no tombstone table
    * the read is the plain bucketed scan, unchanged.
    */
  def readServing(spark: SparkSession, table: String, keyCol: String): DataFrame = {
    val tt = tombTableOf(table)
    val base = spark.table(table)
    // catalog-only existence check: no Spark job on the serving path (an
    // empty tombstone table broadcasts near-free, so the anti-join needs
    // no emptiness probe; compaction DROPS the table, restoring the plain
    // bucketed scan)
    if (spark.catalog.tableExists(tt))
      base.join(broadcast(spark.table(tt)), Seq(keyCol), "left_anti")
    else base
  }

  /** Fold tombstones into the files: rewrite the index as survivors-only
    * under the SAME bucket spec (staging table + catalog rename — no
    * driver-side materialization, so the rewrite is one distributed job at
    * any scale), then drop the tombstone table. Run when the tombstone
    * fraction makes the serving anti-join's broadcast non-trivial; until
    * then deletion is O(takedown list). After compaction a previously
    * deleted key may be re-ingested (see the append contracts: while a key
    * is tombstoned, re-appending it is a no-op-or-hidden — compaction is
    * the reinstatement point).
    */
  def compactTombstones(spark: SparkSession, table: String, keyCol: String): Unit = {
    val tt = tombTableOf(table)
    // Crash recovery (r8): between the two RENAMEs below the serving name
    // is briefly absent — a crash in that window strands the index under
    // <table>_precompact, and a naive rerun would throw at getTableMetadata
    // instead of finishing the job. Roll the interrupted swap forward
    // first: if the serving name is gone but the backup exists, the
    // staging table (when present and complete) becomes the serving table,
    // else the backup is restored. Only then proceed (or return) normally.
    recoverSwap(spark, table, tt)
    if (!spark.catalog.tableExists(tt)) return
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalStateException(s"$table is not bucketed"))
    val staging = table + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    val w = readServing(spark, table, keyCol)
      .write.mode("overwrite").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w).saveAsTable(staging)
    // Swap order: the serving table is offline only between the two
    // metadata renames (no data movement in that window — concurrent reads
    // in that instant DO fail; single-writer-brief-outage is the contract,
    // not online swap), the backup keeps the pre-compaction files
    // recoverable until the swap succeeded, and the tombstone record is
    // dropped LAST — a crash anywhere leaves either the old
    // (table, tombstones) pair, a `recoverSwap`-completable rename pair,
    // or the compacted table plus a redoable record; never a lost index.
    val backup = table + "_precompact"
    spark.sql(s"DROP TABLE IF EXISTS `$backup`")
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$backup`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$backup`")
    spark.sql(s"DROP TABLE `$tt`")
  }

  /** Complete a compaction swap interrupted by a crash (r8). The swap's
    * only unsafe window is between its two RENAMEs: the serving name is
    * absent and the index lives under `<table>_precompact`. Roll FORWARD
    * when the fully-written staging table is present (it always is in
    * that window — `saveAsTable` completed before the swap began), else
    * roll BACK to the backup. A backup left beside an intact serving
    * table means the crash hit AFTER the swap, before cleanup — drop the
    * backup only. The tombstone table is deliberately NOT dropped here:
    * tombstones appended after the crash must survive recovery, and
    * already-folded keys anti-join against nothing — the compaction that
    * follows re-folds whatever remains. Idempotent; no-op when no rename
    * pair is stranded.
    */
  private def recoverSwap(spark: SparkSession, table: String, tt: String): Unit = {
    val backup = table + "_precompact"
    val staging = table + "_compacting"
    if (!spark.catalog.tableExists(backup)) return
    if (!spark.catalog.tableExists(table)) {
      if (spark.catalog.tableExists(staging)) {
        spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
        spark.sql(s"DROP TABLE `$backup`")
      } else {
        spark.sql(s"ALTER TABLE `$backup` RENAME TO `$table`")
      }
    } else {
      spark.sql(s"DROP TABLE `$backup`")
    }
  }

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
