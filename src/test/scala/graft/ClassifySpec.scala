package graft

import org.apache.spark.sql.functions._
import graft.llm.Classify
import graft.GraftConfig.withInt

/** D75 distributed classifier training. The testdata labels are
  * near-noise for a linear model, so learning is proven on a separable
  * synthetic corpus (the embed_knn_classify pattern); the catalog query's
  * cross-engine exactness is the oracle gate's job.
  */
class ClassifySpec extends SparkSpecBase {

  /** Linearly separable corpus: class 1 concentrates mass on dim 0,
    * class 0 on dim 1, with a deterministic per-id wobble on the rest.
    * Labels: vec_id even → label 2 (y=1 under label<5), odd → label 7.
    */
  private def separable(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val y1 = i % 2 == 0
      val emb = Array.tabulate(llm.Ann.Dim) { d =>
        val wobble = (((i * 31 + d * 17) % 13) - 6) / 100.0f
        if (d == 0 && y1) 1.0f + wobble
        else if (d == 1 && !y1) 1.0f + wobble
        else wobble
      }
      (i.toLong, emb, if (y1) 2 else 7)
    }.toDF("vec_id", "embedding", "label")
  }

  // the production featurization, not a spec-local copy (drift-proof)
  private def featurizedOf(df: org.apache.spark.sql.DataFrame) =
    Classify.featurized(df)

  test("trainer separates a linearly separable corpus") {
    val out = Classify.embedLogregOf(featurizedOf(separable(400))).collect()
    Checkpoints.releaseAll()
    val n = out.map(_.getLong(2)).sum
    assert(n === 80, s"holdout must be the vec_id%5 slice, got $n")
    val correct = out.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(correct.toDouble / n >= 0.95,
      s"separable corpus not learned: ${correct}/$n correct ($out)")
    // share_bp reconciles exactly: basis points over the holdout
    out.foreach { r =>
      assert(r.getLong(3) === r.getLong(2) * 10000L / n, s"share_bp drift: $r")
    }
  }

  test("more iterations do not hurt separable-holdout accuracy") {
    def acc(iters: Int): Double = withInt("graft.logreg.iters", iters) {
      val out = Classify.embedLogregOf(featurizedOf(separable(400))).collect()
      Checkpoints.releaseAll()
      val n = out.map(_.getLong(2)).sum
      out.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum.toDouble / n
    }
    val a1 = acc(1); val a5 = acc(5)
    assert(a5 >= a1 - 1e-9, s"accuracy degraded with iterations: T=1 $a1 vs T=5 $a5")
  }

  test("catalog query: consistent confusion accounting on testdata") {
    val out = Classify.embedLogreg(spark, sfDir).collect()
    Checkpoints.releaseAll()
    val holdout = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 5 === 0).count()
    assert(out.map(_.getLong(2)).sum === holdout, "confusion rows lose holdout docs")
    assert(out.length <= 4 && out.nonEmpty)
    assert(out.forall(r => Set(0, 1)(r.getInt(0)) && Set(0, 1)(r.getInt(1))))
  }

  test("corpus scorer: every doc scored once, pred consistent with z, learnable") {
    // on the separable corpus the baked scorer must label ~everything right
    // (train AND holdout get scored — a deployment gates the whole corpus)
    val out = Classify.qualityLogregOf(featurizedOf(separable(400))).collect()
    Checkpoints.releaseAll()
    assert(out.length === 400, "scorer must emit one row per doc")
    assert(out.map(_.getLong(0)).distinct.length === 400, "duplicate doc scores")
    out.foreach { r =>
      assert((r.getDouble(1) >= 0) === (r.getInt(2) == 1),
        s"pred inconsistent with z_score sign: $r")
    }
    val correct = out.count(r => (r.getLong(0) % 2 == 0) == (r.getInt(2) == 1))
    assert(correct >= 380, s"baked scorer mislabels the separable corpus: $correct/400")
  }

  test("agreement sheet: tier totals reconcile, every doc accounted") {
    val rows = Classify.qualityLogregAgreement(spark, sfDir).collect()
    Checkpoints.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(0, 1)(r.getInt(1))))
    // per tier: basis points of the tier's cells sum to ~10000 (floor'd)
    rows.groupBy(_.getLong(0)).foreach { case (tier, cells) =>
      val bp = cells.map(_.getLong(3)).sum
      assert(bp >= 9998 && bp <= 10000, s"tier $tier share_bp sum off: $bp")
      val tn = cells.map(_.getLong(2)).sum
      cells.foreach(c => assert(c.getLong(3) === c.getLong(2) * 10000L / tn))
    }
    // nothing dropped: cell counts sum to the corpus size
    val total = rows.map(_.getLong(2)).sum
    assert(total === Tables.embeddings(spark, sfDir).count(),
      "agreement sheet lost documents")
  }

  test("oracle SQL re-reads the iteration config") {
    assert(Classify.embedLogregSql.contains("w3 AS"))
    withInt("graft.logreg.iters", 5) {
      assert(Classify.embedLogregSql.contains("w5 AS"),
        "embedLogregSql did not re-read graft.logreg.iters")
    }
  }

  /** Quality-gradient text corpus for D87: every doc is 100 tokens, zero
    * punctuation, with i%101 copies of a stopword and the rest junk words
    * — so qualityExpr reduces to the stopword ratio (the other two terms
    * are constant), the tier extremes are the stopword-heavy vs -light
    * docs, and the DSIR bucket frequencies expose exactly that ratio to
    * the linear model: separable by construction.
    */
  private def gradientDocs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val s = i % 101
      val toks = Seq.fill(s)("the") ++
        Seq.tabulate(100 - s)(j => Seq("zig", "zag", "zog")(j % 3))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("text classifier: learns the tier extremes from bucket features, scores all docs") {
    val docs = gradientDocs(400)
    val preds = Classify.qualityLogregTextOf(docs).collect()
    assert(preds.length === 400, "text scorer must emit one row per doc")
    preds.foreach { r =>
      assert((r.getDouble(1) >= 0) === (r.getInt(2) == 1),
        s"pred inconsistent with z_score sign: $r")
    }
    // the weak labels the trainer saw: tier extremes of the same corpus
    val tiers = graft.llm.Corpus.qualityTiersOf(docs)
      .select(col("doc_id"), col("tier")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Checkpoints.releaseAll()
    val labeled = preds.filter(r => Set(1L, 10L)(tiers(r.getLong(0))))
    assert(labeled.length >= 40, "gradient corpus must populate both tier extremes")
    val correct = labeled.count(r =>
      (tiers(r.getLong(0)) == 10L) == (r.getInt(2) == 1))
    assert(correct.toDouble / labeled.length >= 0.9,
      s"bucket features failed to separate the tier extremes: " +
        s"$correct/${labeled.length}")
  }

  test("text agreement sheet: tier totals reconcile, every doc accounted") {
    val rows = Classify.qualityLogregTextAgreement(spark, sfDir).collect()
    Checkpoints.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(0, 1)(r.getInt(1))))
    rows.groupBy(_.getLong(0)).foreach { case (tier, cells) =>
      val bp = cells.map(_.getLong(3)).sum
      assert(bp >= 9998 && bp <= 10000, s"tier $tier share_bp sum off: $bp")
    }
    assert(rows.map(_.getLong(2)).sum ===
      Tables.documents(spark, sfDir).count(),
      "text agreement sheet lost documents")
  }
}
