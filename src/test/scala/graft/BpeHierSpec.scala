package graft

import org.apache.spark.sql.functions._
import graft.llm.BpeHier

/** D95/D95b (r12): hierarchical-BPE trainer + O(len·log len) encoder.
  * Pins (1) the trainer reaches the full default width (≥5000 rules) on
  * the spec corpus, (2) the heap encoder ≡ rank-sequential replace-all
  * (the oracle's semantics) property-style, (3) round-trip integrity over
  * the whole corpus, (4) determinism, (5) hand-verifiable toy behavior.
  */
class BpeHierSpec extends SparkSpecBase {

  test("trainer reaches the full default width (>= 5000 rules) at sf0.001") {
    val merges = BpeHier.trainedMerges(spark, sfDir)
    assert(merges.length == BpeHier.HierMerges, s"got ${merges.length}")
    // ranks mint ids 28+r in order; pair ids only reference earlier symbols
    merges.zipWithIndex.foreach { case ((a, b, x, n), r) =>
      assert(x == 28 + r && a < x && b < x && n >= 1)
    }
    // true HIERARCHY: later merges consume minted ids (the capability the
    // single-level family lacks)
    assert(merges.exists { case (a, b, _, _) => a >= 28 || b >= 28 })
  }

  test("toy trainer: most-frequent pair wins, ties break (left,right) asc") {
    // "ababab", "abac": pairs (a,b)x4? ababab has (a,b)x3,(b,a)x2; abac
    // has (a,b),(b,a),(a,c) -> (a,b):4 wins; after merge X=(a,b):
    // "XXX" -> (X,X):2 wins next
    def c(s: String) = BpeHier.codesOf(s)
    val merges = BpeHier.train(Array(c("ababab"), c("abac")), 2)
    assert(merges(0) == ((0, 1, 28, 4L)))
    assert(merges(1) == ((28, 28, 29, 2L)))
  }

  test("heap encoder == rank-sequential replace-all on random docs") {
    val merges = BpeHier.trainedMerges(spark, sfDir)
    val rules = scala.collection.mutable.LongMap.empty[Int]
    val rankPair = new Array[(Int, Int)](merges.length)
    merges.zipWithIndex.foreach { case ((a, b, _, _), r) =>
      rules.update((a.toLong << 15) | b, r); rankPair(r) = (a, b)
    }
    val rng = new scala.util.Random(7)
    // random ASCII-band docs + degenerate shapes (runs, empty, single)
    val docs = Seq("", "a", "aaaaaaa", "ab ab ab ab") ++
      (0 until 40).map(_ => (0 until 200).map(_ => "abcdefghij0 ".charAt(rng.nextInt(12))).mkString)
    docs.foreach { d =>
      val codes = BpeHier.codesOf(d)
      val fast = BpeHier.encodeHier(codes, rules, rankPair)
      val slow = merges.foldLeft(codes) { case (arr, (a, b, x, _)) =>
        BpeHier.applyMerge(arr, a, b, x)
      }
      assert(java.util.Arrays.equals(fast, slow), s"doc '$d'")
    }
  }

  test("round-trip holds for every document at the full width") {
    val rt = BpeHier.bpeRoundtripHier(spark, sfDir)
    assert(rt.filter(!col("roundtrip_ok")).count() == 0)
    val docs = Tables.documents(spark, sfDir).count()
    assert(rt.count() == docs)
    // compression: hierarchical merges must beat chars substantially
    val sums = rt.agg(sum("n_tokens"), sum("n_chars")).head()
    assert(sums.getLong(0) * 2 < sums.getLong(1),
      s"tokens ${sums.getLong(0)} vs chars ${sums.getLong(1)}")
  }

  test("training is deterministic (fresh run == cached table)") {
    val cached = BpeHier.trainedMerges(spark, sfDir)
    val sample = Tables.documents(spark, sfDir)
      .orderBy(col("doc_id").asc).limit(BpeHier.TrainDocs)
      .select(graft.llm.TextOps.lmNorm(col("text")))
      .collect().map(r => BpeHier.codesOf(r.getString(0)))
    val fresh = BpeHier.train(sample, BpeHier.HierMerges)
    assert(cached.sameElements(fresh))
  }

  test("decode expands nested merges to base codes") {
    // rules: 28=(a,b), 29=(28,c) -> decode [29, 3] == [a,b,c,d]
    val rankPair = Array((0, 1), (28, 2))
    val out = BpeHier.decodeHier(Array(29, 3), rankPair)
    assert(out.toSeq == Seq(0, 1, 2, 3))
  }
}
