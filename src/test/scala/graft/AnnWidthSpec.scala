package graft

import org.apache.spark.sql.functions._
import graft.llm.Ann
import graft.GraftConfig.withInt

/** The r8 `graft.ann.*` width config (VERDICT item 2): the LSH/IVF width
  * constants were baked small-scale values — 16 buckets per embedding band,
  * 256 LSH buckets, 16 IVF cells — with the scaladoc naming "raise P" as
  * the 100 TB lever but no path to pull it. These tests pin that the lever
  * now exists and does what the scaling argument claims:
  *  - candidate volume strictly shrinks at a wider P on the same corpus,
  *  - candidate volume grows SUPERLINEARLY with corpus size at a FIXED
  *    width (the empirical exhibit of why a fixed width is a scale bug),
  *  - the confirmed output at a coarser banding of the same plane family
  *    nests (band' = concatenated band pairs ⊆ original candidates), and
  *    exact-duplicate pairs survive EVERY width (they agree on all planes),
  *  - the SQL-oracle generators re-read the config (no stale captured
  *    width can desync the two engines),
  *  - the persisted ANN index folds the width into its table name, so a
  *    width change rebuilds instead of silently mis-probing.
  */
class AnnWidthSpec extends SparkSpecBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Deterministic synthetic corpus: n unit-ish float vectors, Dim-wide. */
  private def randVecs(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(Ann.Dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("wider P strictly shrinks candidate volume on the same corpus") {
    val v = randVecs(500, 11L)
    val narrow = Ann.embCandidateRows(v) // default 4 bands x 4 planes
    Checkpoints.releaseAll()
    val wide = withInt("graft.ann.embPlanesPerBand", 8) {
      val c = Ann.embCandidateRows(v); Checkpoints.releaseAll(); c
    }
    assert(narrow > 0, "narrow width produced no candidates — vacuous")
    assert(wide < narrow,
      s"P=8 did not shrink the candidate join: P=4→$narrow, P=8→$wide")
  }

  test("candidate volume grows superlinearly with corpus size at fixed width") {
    val small = Ann.embCandidateRows(randVecs(400, 7L))
    Checkpoints.releaseAll()
    val big = Ann.embCandidateRows(randVecs(800, 7L))
    Checkpoints.releaseAll()
    // per-bucket occupancy n/2^P ⇒ pairs ~ n²: doubling n should ~4× the
    // join rows; > 2.5× is the conservative superlinearity assertion
    assert(big.toDouble / small > 2.5,
      s"fixed-width candidate growth not superlinear: n=400→$small, n=800→$big")
  }

  test("coarser banding of the same planes nests; exact dups survive all widths") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // plant exact duplicates: ids 1e6+k carry copies of vectors 0..4 —
    // duplicate pairs agree on EVERY hyperplane, so any (B,P) width must
    // confirm them (cos = 1): the provable invariance slice
    val dups = base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val v = base.union(dups)
    val fine = pairSet(Ann.dedupEmbeddingOf(v).select(col("id_a"), col("id_b")))
    Checkpoints.releaseAll()
    // (B=2, P=8) over the SAME 16 planes: band'_k = planes 8k..8k+7 =
    // original bands 2k ∪ 2k+1, so agreement on band'_k implies agreement
    // on both constituent bands ⇒ candidates(2,8) ⊆ candidates(4,4) ⇒ the
    // confirmed outputs nest (confirm is width-independent)
    val coarse = withInt("graft.ann.embBands", 2) {
      withInt("graft.ann.embPlanesPerBand", 8) {
        val p = pairSet(Ann.dedupEmbeddingOf(v).select(col("id_a"), col("id_b")))
        Checkpoints.releaseAll(); p
      }
    }
    assert(coarse.subsetOf(fine),
      s"(2,8) found pairs outside (4,4): ${(coarse -- fine).take(5)}")
    val dupPairs = (0L until 5L).map(k => (k, k + 1000000L)).toSet
    assert(dupPairs.subsetOf(fine), "exact-dup pairs missing at (4,4)")
    assert(dupPairs.subsetOf(coarse), "exact-dup pairs missing at (2,8)")
  }

  test("oracle-SQL generators re-read the width config") {
    val sqlDefault = Ann.dedupEmbeddingSql
    assert(sqlDefault.contains("3 AS band_idx") && !sqlDefault.contains("4 AS band_idx"))
    withInt("graft.ann.embBands", 2) {
      val sql = Ann.dedupEmbeddingSql
      assert(sql.contains("1 AS band_idx") && !sql.contains("2 AS band_idx"),
        "dedupEmbeddingSql captured a stale band count")
    }
    withInt("graft.ann.numPlanes", 10) {
      assert(Ann.annLshMultiprobeSql.contains(s"xor(bucket, ${1L << 9})"),
        "annLshMultiprobeSql captured a stale plane count")
    }
    withInt("graft.ann.numCells", 32) {
      assert(Ann.annIvfSql.contains("vec_id < 32"),
        "annIvfSql captured a stale cell count")
    }
  }

  test("lsh and ivf contracts hold at non-default widths") {
    withInt("graft.ann.numPlanes", 12) {
      val r = Ann.annLsh(spark, sfDir)
      // per-query ranked prefix, ranks contiguous from 1 (a query may have
      // < 5 bucket-mates at the finer width)
      val byQ = r.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx")).collect()
      assert(byQ.nonEmpty)
      byQ.foreach(row => assert(row.getLong(1) <= 5 && row.getLong(1) == row.getInt(2)))
      Checkpoints.releaseAll()
    }
    withInt("graft.ann.numCells", 8) {
      val cents = Ann.ivfCentroids(spark, sfDir)
      assert(cents.count() <= 8 && cents.count() > 0)
      val r = Ann.annIvf(spark, sfDir)
      assert(r.groupBy(col("q_id")).count().filter(col("count") > 5).count() == 0L)
      Checkpoints.releaseAll()
    }
  }

  test("persisted index name folds the plane width: width change rebuilds") {
    val t8 = graft.sources.AnnIndexSink.ensureEmbeddingIndex(spark, sfDir)
    val t12 = withInt("graft.ann.numPlanes", 12) {
      graft.sources.AnnIndexSink.ensureEmbeddingIndex(spark, sfDir)
    }
    assert(t8 != t12, "width change reused the stale bucket layout")
    assert(spark.catalog.tableExists(t8) && spark.catalog.tableExists(t12))
    // the wide index genuinely used the wide scheme: stored bucket ids
    // exceed the 8-plane universe somewhere
    assert(spark.table(t12).agg(max(col("bucket"))).head().getLong(0) >= 256L,
      "12-plane index holds only 8-plane bucket ids")
    spark.sql(s"DROP TABLE IF EXISTS `$t12`")
  }

  test("nprobe is a live query-time lever: full-depth IVF equals brute force") {
    // graft.ann.nprobe (r10): at nprobe = NumCells every vector's home
    // cell is probed, so IVF's candidate set is the whole corpus and the
    // serving output must equal brute force byte-for-byte — the endpoint
    // that proves the lever changes ONLY recall breadth, never scoring
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    val bf = rows(Ann.annBruteforce(spark, sfDir))
    Checkpoints.releaseAll()
    val full = withInt("graft.ann.nprobe", Ann.NumCells) {
      val r = rows(Ann.annIvf(spark, sfDir)); Checkpoints.releaseAll(); r
    }
    assert(full === bf && bf.nonEmpty,
      "full-depth IVF diverged from brute force")
    // the oracle generator re-reads the lever (no stale captured depth)
    withInt("graft.ann.nprobe", 3) {
      assert(Ann.annIvfSql.contains("rn <= 3"),
        "annIvfSql did not re-read graft.ann.nprobe")
    }
  }
}
