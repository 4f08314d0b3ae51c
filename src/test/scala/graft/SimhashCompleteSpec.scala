package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Property tests for the r8 simhash blocking (llm/Dedup.scala
  * `simhashPairs`): the Manku block-combo candidate generation must be
  * COMPLETE for Hamming ≤ 6 — every qualifying pair found, none invented —
  * against brute-force Hamming over synthetic bit-mutant signatures, at
  * several block counts b (the `graft.simhash.blocks` scale lever). This is
  * the D4c proof pattern: the oracle/production blocking may differ freely
  * because the exact confirm makes output blocking-independent, but ONLY
  * once completeness is property-proven — which is this spec.
  */
class SimhashCompleteSpec extends SparkSpecBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Synthetic signature battery: random 64-bit bases, each with mutants at
    * every Hamming distance 0..10 — straddling the ≤ 6 cutoff from both
    * sides, including the 6-bits-spread-across-bands shape that the r7
    * 4×8-bit banding provably missed (pigeonhole only covered ≤ 3).
    */
  private def mutantSigs(seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until 25).flatMap { i =>
      val base = rnd.nextLong()
      (0 to 10).map { d =>
        val flipped = rnd.shuffle((0 until 64).toList).take(d)
          .foldLeft(base)((x, b) => x ^ (1L << b))
        (i * 100L + d, flipped)
      }
    }
  }

  test("block-combo blocking == brute-force Hamming <= 6, at b = 7, 8, 10, 12") {
    import spark.implicits._
    val sigs = mutantSigs(42L).toDF("doc_id", "sh")
    // brute force: every pair, exact bit_count(xor) — the ground truth the
    // engine must never be allowed to compute at scale but a 275-row test
    // battery can
    val a = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val brute = pairSet(a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= Dedup.SimhashK))
    assert(brute.nonEmpty, "battery produced no qualifying pairs — vacuous")
    // sanity: the battery also has pairs JUST OVER the cutoff, so a
    // blocking that over-matches would be caught
    assert(a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).between(7, 10))
      .count() > 0, "no pairs just over the cutoff — vacuous upper side")
    for (nBlocks <- Seq(7, 8, 10, 12)) {
      assert(pairSet(Dedup.simhashPairs(sigs, nBlocks)) == brute,
        s"blocking at b=$nBlocks diverged from brute-force Hamming")
    }
  }

  test("wider b yields strictly fewer candidate-join rows on random sigs") {
    import spark.implicits._
    // uniform random battery, n large enough that the narrow key space
    // (b=7 → ~2^9 buckets/band) collides by birthday counting while the
    // wide one (b=12 → ~2^32 keys/combo) stays near-empty — the empirical
    // exhibit of WHY `graft.simhash.blocks` is the 100 TB lever
    val rnd = new scala.util.Random(7L)
    val sigs = (0 until 600).map(i => (i.toLong, rnd.nextLong()))
      .toDF("doc_id", "sh")
    // the ENGINE's own bucket rows (not a re-derivation: a copy here would
    // keep measuring the old layout if the key fold ever changed)
    def candidates(b: Int): Long = {
      val keyed = Dedup.simhashKeyed(sigs, b)
      keyed.select(col("doc_id").as("doc_a"), col("combo"), col("key"))
        .join(keyed.select(col("doc_id").as("doc_b"), col("combo"), col("key")),
          Seq("combo", "key"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    val c7 = candidates(7); val c12 = candidates(12)
    assert(c12 < c7,
      s"wider key space did not shrink the candidate join: b=7→$c7, b=12→$c12")
  }

  test("simhash layout covers all 64 bits exactly once for every b") {
    for (b <- 7 to 16) {
      val layout = Dedup.simhashLayout(b)
      assert(layout.map(_._2).sum == 64, s"b=$b widths don't sum to 64")
      val covered = layout.flatMap { case (off, w) => off until (off + w) }
      assert(covered.sorted == (0 until 64).toList, s"b=$b bit coverage broken")
    }
  }
}
