package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** NATIVE sf1 drop (r13 — the r12 verdict's item 7): the amplified decade
  * (ScalingXL) replicates sf0.1 with character rotation, which preserves
  * shapes but cannot create NEW content statistics. This tool generates a
  * true 10×-sf0.1 corpus by SAMPLING the shipped testdata's empirical
  * distributions with fresh draws — the distribution family is the
  * driver's, the content is not a transform of any shipped row:
  *   - documents (50k): token stream sampled from sf0.1's unigram
  *     frequency table; per-doc token counts resampled from the empirical
  *     length distribution; lang/source from their empirical marginals;
  *     duplicate structure planted at the measured rates (~0.16% exact
  *     copies, ~2% docs splicing a 12-40-token span from another doc —
  *     sf0.1 has 8/5000 exact dup rows and a nonzero cross-doc span
  *     census, so a realistic sf1 must too);
  *   - embeddings (20k): per-(label, dim) mean/std measured from sf0.1,
  *     fresh Gaussian draws per vector — the label-cluster geometry the
  *     ANN/kmeans/classify families depend on survives, the vectors are
  *     new;
  *   - remaining tables copy from sf0.1 (the gated sf1 families —
  *     dedup/lexical/ANN/corpus — read only documents/embeddings).
  *
  * Every row derives from its id through SplittableRandom(seed ⊕ id) —
  * pure per-id functions, so the output is bit-identical across
  * partitionings and reruns (the testdata discipline).
  *
  * Run: sbt 'Test/runMain graft.tools.NativeSf1 [outDir]'
  * (default /tmp/graft_sf1_native; ~60 MB). Measurement and the DuckDB
  * hash gate run via the usual mains against the emitted dir.
  */
/** Serializable per-id generator (everything the executors need travels
  * as plain fields; all draws come from SplittableRandom(seed ⊕ f(id))).
  */
case class Sf1Gen(seed: Long, words: Array[String], cum: Array[Long],
                  total: Long, lengths: Array[Int]) extends Serializable {
  def pick(cumW: Array[Long], r: Long): Int = {
    val i = java.util.Arrays.binarySearch(cumW, r + 1)
    if (i >= 0) i else -i - 1
  }
  def baseTokens(id: Long): Array[String] = {
    val rng = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
    val n = lengths(rng.nextInt(lengths.length))
    Array.fill(n)(words(pick(cum, rng.nextLong(total))))
  }
  def srcOf(id: Long): Long = {
    var cur = id
    var hops = 0
    while (hops < 8) {
      val rng = new java.util.SplittableRandom(seed ^ (cur * 0xC2B2AE3D27D4EB4FL))
      val roll = rng.nextDouble()
      if (cur > 0 && roll < 0.0016) { cur = rng.nextLong(cur); hops += 1 }
      else return cur
    }
    cur
  }
  def textOf(id: Long): String = {
    val src = srcOf(id)
    if (src != id) baseTokens(src).mkString(" ")
    else {
      val rng = new java.util.SplittableRandom(seed ^ (id * 0xD6E8FEB86659FD93L))
      val toks = baseTokens(id)
      if (id > 0 && rng.nextDouble() < 0.02) {
        val donor = baseTokens(srcOf(rng.nextLong(id)))
        val spanLen = 12 + rng.nextInt(29)
        if (donor.length > spanLen) {
          val off = rng.nextInt(donor.length - spanLen)
          val at = rng.nextInt(toks.length + 1)
          (toks.take(at) ++ donor.slice(off, off + spanLen) ++ toks.drop(at))
            .mkString(" ")
        } else toks.mkString(" ")
      } else toks.mkString(" ")
    }
  }
}

object NativeSf1 {
  val Mult = 10
  val Seed = 0x5f13c0de

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1_native")
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._

    // ---- empirical distributions from sf0.1 (tiny driver collects) ----
    val docs01 = Tables.documents(spark, sfDir)
    val vocabFreq = docs01
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().orderBy(col("w").asc)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val words = vocabFreq.map(_._1)
    val cum = vocabFreq.map(_._2).scanLeft(0L)(_ + _).drop(1)
    val total = cum.last
    val lengths = docs01
      .select(size(split(col("text"), "\\s+")).as("n"))
      .collect().map(_.getInt(0))
    val langs = docs01.groupBy("lang").count().orderBy(col("lang").asc)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val sources = docs01.groupBy("source").count().orderBy(col("source").asc)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def marginal(m: Array[(String, Long)]): (Array[String], Array[Long]) =
      (m.map(_._1), m.map(_._2).scanLeft(0L)(_ + _).drop(1))
    val (langV, langC) = marginal(langs)
    val (srcV, srcC) = marginal(sources)
    val nDocs = docs01.count().toInt * Mult

    val embStats = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(avg(col("v").cast("double")).as("mu"),
        stddev_pop(col("v").cast("double")).as("sd"))
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Int]("pos")) ->
        ((r.getAs[Double]("mu"), r.getAs[Double]("sd")))).toMap
    val labelFreq = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().orderBy(col("label").asc)
      .collect().map(r => r.getAs[Int]("label") -> r.getLong(1))
    val (labV, labC) = (labelFreq.map(_._1), labelFreq.map(_._2).scanLeft(0L)(_ + _).drop(1))
    val dim = graft.llm.Ann.Dim
    val nVecs = labC.last.toInt / 1 * Mult

    // ---- pure per-id generation (serializable generator travels) ----
    val gen = Sf1Gen(Seed, words, cum, total, lengths)
    val langVL = langV; val langCL = langC
    val srcVL = srcV; val srcCL = srcC
    val docsOut = spark.range(0, nDocs, 1, 64).map { id =>
      val rng = new java.util.SplittableRandom(gen.seed ^ (id * 0xA24BAED4963EE407L))
      val text = gen.textOf(id)
      (id, text, langVL(gen.pick(langCL, rng.nextLong(langCL.last))),
        srcVL(gen.pick(srcCL, rng.nextLong(srcCL.last))), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docsOut.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val labVL = labV; val labCL = labC
    val embStatsL = embStats
    val dimL = dim
    val seedL = Seed.toLong
    val vecsOut = spark.range(0, nVecs, 1, 64).map { id =>
      val rng = new java.util.SplittableRandom(seedL ^ (id * 0x9E3779B97F4A7C15L) + 7)
      val lab = labVL(gen.pick(labCL, rng.nextLong(labCL.last)))
      val v = Array.tabulate(dimL) { d =>
        val (mu, sd) = embStatsL((lab, d))
        (mu + sd * rng.nextGaussian()).toFloat
      }
      (id, v, lab)
    }.toDF("vec_id", "embedding", "label")
    vecsOut.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"NATIVESF1 dir=$out docs=$nDocs vecs=$nVecs vocab=${words.length}")
    spark.stop()
  }
}
