package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed quality-classifier training (SURVEY §2 D75).
  *
  * Every serious pretraining pipeline trains a lightweight linear
  * classifier to score documents (CCNet's fastText LM filter, GPT-3's
  * WebText-vs-CommonCrawl LR, LLaMA's wikipedia-reference classifier —
  * public literature). The engine piece that matters at 100 TB is the
  * TRAINER: full-batch gradient descent where each iteration is one
  * map-side-combinable aggregate over the corpus — (Dim+1) partial sums —
  * and the model stays a broadcast-sized 1-row frame that never leaves
  * the cluster (no driver collect, no parameter server).
  *
  * Engine-exactness (the novel constraint vs a stock LR): logistic
  * sigmoid needs exp(), and libm exp differs in the last ulp between the
  * JVM and DuckDB — a 1-ulp activation difference would cascade through
  * the weight updates and desync the engines. Two substitutions make
  * training bit-identical instead:
  *  - the RATIONAL sigmoid s(z) = 0.5 + z / (2·(1+|z|)): same shape,
  *    range (0,1), s(0)=0.5 — but built from add/sub/mul/div/abs only,
  *    all IEEE-754 correctly-rounded, so both engines compute the exact
  *    same doubles;
  *  - per-row gradient terms cast to DECIMAL(28,10) BEFORE the sum
  *    (deterministic rounding), so the gradient aggregate is exact and
  *    order-independent — no summation-order drift across partitionings
  *    or engines (the ivfCentroids discipline applied to training).
  * The z = w·x fold is the ANN family's left-to-right double dot product.
  *
  * Train/eval hygiene: vec_id % 5 == 0 is the holdout (never touches a
  * gradient); the reported confusion matrix is holdout-only, in exact
  * integers (counts + basis points), so the oracle hash-checks training
  * end-to-end — T full GD iterations replayed identically in DuckDB.
  * Iteration count is live config (`graft.logreg.iters`, default 3).
  *
  * The testdata labels are near-noise for a linear model (~0.55 holdout
  * accuracy) — the catalog row checks the TRAINER, not the corpus;
  * ClassifySpec proves learning on a separable synthetic corpus (the
  * embed_knn_classify pattern).
  */
object Classify {

  val Dim: Int = Ann.Dim
  private val NFeat = Dim + 1 // intercept at position 0

  /** GD iterations (full-batch, lr = 1). Config-capped at 10: each
    * iteration is one corpus pass; the oracle unrolls the same count.
    */
  def Iters: Int = {
    val t = graft.GraftConfig.int("graft.logreg.iters", 3)
    require(t >= 1 && t <= 10, s"graft.logreg.iters must be in [1,10], got $t")
    t
  }

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))

  /** Binary target: label < 5 (the "high-quality half" stand-in; a real
    * deployment feeds its own label column). Features = [1.0, embedding]
    * as doubles.
    */
  private[graft] def featurized(v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      when(col("label") < 5, 1.0).otherwise(0.0).as("y"),
      array(lit(1.0).cast("double") +:
        (0 until Dim).map(i => element_at(col("embedding"), i + 1).cast("double")): _*)
        .as("x"))

  /** z = w · x, left-to-right over the NFeat terms (w arrives as a 1-row
    * broadcast array column) — the dotSql fold order.
    */
  private def zOf(w: Column, x: Column): Column =
    (0 until NFeat).map(j => element_at(w, j + 1) * element_at(x, j + 1)).reduce(_ + _)

  /** Rational sigmoid — correctly-rounded IEEE ops only (see scaladoc). */
  private def sig(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** One GD step: w' = w − mean over train of (s(w·x) − y)·x. The corpus
    * pass emits per-row decimal terms; the exchange carries NFeat
    * partially-aggregated (sum, count) pairs; the 1-row w' frame is
    * rebuilt with the ivfCentroids collect_list(sort) idiom.
    */
  private def step(train: DataFrame, wf: DataFrame): DataFrame =
    graft.Checkpoints.cp(
      train.crossJoin(broadcast(wf))
        .withColumn("f", sig(zOf(col("w"), col("x"))) - col("y"))
        .select(col("f"), posexplode(col("x")).as(Seq("pos", "xj")))
        .select(col("pos"), (col("f") * col("xj")).cast("decimal(28,10)").as("t"))
        .groupBy(col("pos"))
        .agg(sum(col("t")).as("s"), count(lit(1)).as("n"))
        .crossJoin(broadcast(wf))
        .select(col("pos"),
          (element_at(col("w"), col("pos") + 1) -
            col("s").cast("double") / col("n")).as("wj"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("wj")))),
          p => p.getField("wj")).as("w")))

  /** D75: train T full-batch GD iterations on the 80% train slice, then
    * report the HOLDOUT confusion matrix in exact integers: per (y_true,
    * pred): count and basis points of the holdout. pred = (z ≥ 0) — the
    * sigmoid threshold without the sigmoid.
    */
  def embedLogreg(spark: SparkSession, dir: String): DataFrame =
    embedLogregOf(featurized(vecs(spark, dir)))

  /** The trained 1-row weight frame: T GD iterations on the 80% train
    * slice (vec_id % 5 != 0) — shared by the D75 confusion report and the
    * D82 corpus-scoring pass. `f` must already be barriered.
    */
  private[graft] def trainedWeights(f: DataFrame): DataFrame = {
    val train = f.filter(col("vec_id") % 5 =!= 0)
    val w0 = f.sparkSession.range(1)
      .select(array((0 until NFeat).map(_ => lit(0.0).cast("double")): _*).as("w"))
    (1 to Iters).foldLeft(w0)((wf, _) => step(train, wf))
  }

  private[graft] def embedLogregOf(feats: DataFrame): DataFrame = {
    val f = graft.Checkpoints.cp(feats)
    val wT = trainedWeights(f)
    val holdout = f.filter(col("vec_id") % 5 === 0)
    // barrier: consumed by both the total aggregate and the output join —
    // without it the holdout scoring pass executes twice
    val confusion = graft.Checkpoints.cp(
      holdout.crossJoin(broadcast(wT))
        .withColumn("pred", when(zOf(col("w"), col("x")) >= 0, 1).otherwise(0))
        .groupBy(col("y").cast("int").as("y_true"), col("pred"))
        .agg(count(lit(1)).as("n")))
    val total = confusion.agg(sum(col("n")).as("n_holdout"))
    confusion.crossJoin(broadcast(total))
      .select(col("y_true"), col("pred"), col("n"),
        expr("n * 10000 div n_holdout").as("share_bp"))
  }

  /** D82: classifier-as-filter — the trained scorer baked over the WHOLE
    * corpus (train + holdout alike: a deployment scores everything), the
    * CCNet/WebText loop closed: D75 trains the model, this pass emits the
    * per-document score the pipeline gates on. Map-only: the 1-row weight
    * frame broadcasts into one corpus scan (the D32 bake pattern) — z is
    * the left-to-right double dot product, identical in both engines, so
    * the scores hash-check; pred is the sigmoid threshold without the
    * sigmoid (z ≥ 0). doc_id = vec_id: the embeddings table is the
    * corpus's embedding column (the dedup_semantic convention).
    */
  def qualityLogreg(spark: SparkSession, dir: String): DataFrame =
    qualityLogregOf(featurized(vecs(spark, dir)))

  private[graft] def qualityLogregOf(feats: DataFrame): DataFrame = {
    val f = graft.Checkpoints.cp(feats)
    f.crossJoin(broadcast(trainedWeights(f)))
      .withColumn("z", zOf(col("w"), col("x")))
      .select(col("vec_id").as("doc_id"), round(col("z"), 6).as("z_score"),
        when(col("z") >= 0, 1).otherwise(0).as("pred"))
  }

  /** D82b: trained-vs-heuristic agreement — the D58 calibration gate with
    * the TRAINED filter in the LM slot: per (D28 quality tier × D82
    * prediction): doc count and exact basis points of the tier. A diagonal
    * (high tiers mostly pred=1) means the cheap heuristic and the trained
    * model gate alike; a flat or inverted sheet says one of them is
    * filtering noise — caught before a bad gate drops petabytes. One
    * doc_id join of two per-doc passes; the output aggregate is bounded by
    * tiers × 2.
    */
  def qualityLogregAgreement(spark: SparkSession, dir: String): DataFrame = {
    val preds = qualityLogreg(spark, dir).select(col("doc_id"), col("pred"))
    val tiers = Corpus.qualityTiers(spark, dir).select(col("doc_id"), col("tier"))
    // barrier: cells feeds both the per-tier totals and the output join
    val cells = graft.Checkpoints.cp(
      preds.join(tiers, Seq("doc_id"))
        .groupBy(col("tier"), col("pred"))
        .agg(count(lit(1)).as("n")))
    val totals = cells.groupBy(col("tier")).agg(sum(col("n")).as("tn"))
    cells.join(broadcast(totals), Seq("tier"))
      .select(col("tier"), col("pred"), col("n"),
        expr("n * 10000 div tn").as("share_bp"))
  }

  private def zSql = s"list_sum(list_transform(range(1, ${NFeat + 1}), i -> w[i] * x[i]))"

  /** Shared oracle CTE prefix (x features → train slice → w0 → T unrolled
    * gradient steps ending in w$Iters) — D75's trainer verbatim, consumed
    * by the confusion report, the corpus scorer, and the agreement sheet.
    */
  private def trainCtes: String = {
    val steps = (1 to Iters).map { k =>
      s"""g$k AS (
      SELECT p.pos AS pos,
             sum(CAST((0.5 + z / (2 * (1 + abs(z))) - y) * x[p.pos + 1]
                 AS DECIMAL(28,10))) AS s,
             count(*) AS n
      FROM (SELECT y, x, $zSql AS z FROM tr, w${k - 1}),
           range(0, $NFeat) p(pos)
      GROUP BY 1),
    w$k AS (
      SELECT list(CAST(w[pos + 1] - CAST(s AS DOUBLE) / n AS DOUBLE)
                  ORDER BY pos) AS w
      FROM g$k, w${k - 1})"""
    }.mkString(",\n    ")
    s"""x AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN label < 5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
             list_prepend(CAST(1.0 AS DOUBLE),
               list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x
      FROM embeddings),
    tr AS (SELECT y, x FROM x WHERE vec_id % 5 != 0),
    w0 AS (SELECT list_transform(range(0, $NFeat), i -> CAST(0.0 AS DOUBLE)) AS w),
    $steps"""
  }

  /** Oracle: the identical T-iteration training unrolled as CTEs — w0 is
    * the zero vector, each wk is one gradient step over the same decimal
    * terms, confusion over the same holdout.
    */
  def embedLogregSql: String =
    s"""WITH $trainCtes,
    conf AS (
      SELECT CAST(y AS INT) AS y_true,
             CASE WHEN $zSql >= 0 THEN 1 ELSE 0 END AS pred,
             CAST(count(*) AS BIGINT) AS n
      FROM x, w$Iters WHERE vec_id % 5 = 0 GROUP BY 1, 2)
    SELECT y_true, pred, n,
           n * 10000 // CAST((SELECT sum(n) FROM conf) AS BIGINT) AS share_bp
    FROM conf"""

  def qualityLogregSql: String =
    s"""WITH $trainCtes
    SELECT vec_id AS doc_id, round(z, 6) AS z_score,
           CASE WHEN z >= 0 THEN 1 ELSE 0 END AS pred
    FROM (SELECT vec_id, $zSql AS z FROM x, w$Iters)"""

  def qualityLogregAgreementSql: String =
    s"""WITH $trainCtes,
    preds AS (
      SELECT vec_id AS doc_id,
             CASE WHEN $zSql >= 0 THEN 1 ELSE 0 END AS pred
      FROM x, w$Iters),
    tq AS (${Corpus.qualityTiersSql}),
    cells AS (
      SELECT t.tier, p.pred, CAST(count(*) AS BIGINT) AS n
      FROM preds p JOIN tq t USING (doc_id) GROUP BY 1, 2),
    tot AS (SELECT tier, sum(n) AS tn FROM cells GROUP BY 1)
    SELECT c.tier, c.pred, c.n,
           CAST(c.n * 10000 // t.tn AS BIGINT) AS share_bp
    FROM cells c JOIN tot t USING (tier)"""
}
