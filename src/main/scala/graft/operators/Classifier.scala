package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import breeze.linalg.{DenseMatrix, DenseVector}
import graft.functions.Deterministic.stableSum

/** Reference-classifier quality scoring — the CCNet / GPT-3 curation
  * pattern: fit a linear classifier that separates a REFERENCE slice of
  * the corpus (here: a trusted language/domain label) from the rest on
  * cheap row-local features, then score every document with it; the
  * score is the "looks like the reference distribution" prior that
  * drives keep/sample decisions.
  *
  * Training is logistic regression by a FIXED number of Newton/IRLS
  * steps from β = 0 (fixed-iteration like [[Similarity.kmeans]]: the
  * pinned artifact is "k deterministic steps", not a convergence
  * claim). Each step is ONE aggregate pass over the feature frame:
  * the per-row Hessian/gradient terms (w·xᵢxⱼ with w = p(1-p), and
  * (y-p)·xᵢ) are decimal-summed (order-independent → partition-count
  * invariant, the golden-fixture requirement), and the 5×5 Newton
  * solve runs INSIDE the plan, in a `map` over the one-row moments
  * frame (Breeze, ridge 1e-6 on the diagonal for numerical safety) —
  * β never touches the driver; each iteration's one-row β frame
  * broadcast-joins into the next pass. At 100 TB: `iters` linear
  * scans, each reducing map-side to 20 decimal cells, plus one
  * scoring scan — no corpus-scaled shuffle anywhere.
  *
  * Inputs: `feats` must carry `idCol`, exactly four feature columns
  * (this unrolling is written for 4 features + intercept — the 5×5
  * moments row is explicit so the whole pass stays one codegen'd
  * aggregate), and `labelCol` ∈ {0.0, 1.0} (the reference indicator).
  * Feature columns should be pre-rounded to 6 dp so an external
  * replay (the numpy cross-check) sees identical operands.
  *
  * Output: one row per input row — (idCol, carry…, score, keep) with
  * score = round(σ(xᵀβ), 6) and keep = score ≥ 0.5. */
object Classifier {

  def logisticScore(feats: DataFrame, idCol: String, featCols: Seq[String],
      labelCol: String, carry: Seq[String] = Nil, iters: Int = 3,
      memoKey: Option[String] = None): DataFrame = {
    require(featCols.size == 4,
      s"logisticScore's moments unrolling is written for exactly 4 features, " +
        s"got ${featCols.size}")
    require(iters >= 1, s"logisticScore needs iters >= 1, got $iters")
    val spark = feats.sparkSession
    import spark.implicits._
    // memoKey: session-wide share of the TRAINED MODEL (the 1-row β
    // frame — the kmeans-chain discipline applied to the cheapest
    // possible memo payload): curate_quality_classifier and
    // curate_classifier_calibration fit the identical IRLS chain over
    // the identical feature frame, so the second caller should pay one
    // scoring scan, not `iters` training aggregates. The key CANNOT see
    // the feature-frame DERIVATION — two callers passing the same tag
    // with identically-named but differently-derived feature columns
    // would silently share a wrong model, so the caller's tag must name
    // the recipe (see QCuration.clfFeatures' "clf-thhe-v1"). Every training
    // parameter folds into the key; carry does NOT (it never affects β).
    val betaKey = memoKey.map(mk =>
      s"$mk/clf/$idCol/${featCols.mkString("+")}/$labelCol/$iters/beta")

    val bCols = (0 to 4).map(i => s"b$i")
    val xs = Seq(lit(1.0)) ++ featCols.map(c => col(c).cast("double"))

    // z = xᵀβ as a flat codegen chain over the broadcast 1-row β frame
    def zCol = bCols.zip(xs).map { case (b, x) => col(b) * x }.reduce(_ + _)

    def train(): DataFrame = {
    var beta: DataFrame =
      spark.range(1).select(bCols.map(b => lit(0.0).as(b)): _*)

    for (_ <- 1 to iters) {
      val scored = feats.crossJoin(broadcast(beta))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-zCol)))
        .withColumn("w", col("p") * (lit(1.0) - col("p")))
        .withColumn("r", col(labelCol).cast("double") - col("p"))
      // upper-triangular H (15 cells) + gradient (5 cells), decimal-summed
      val hCells = for (i <- 0 to 4; j <- i to 4) yield
        stableSum(col("w") * xs(i) * xs(j)).as(s"h${i}$j")
      val gCells = (0 to 4).map(i => stableSum(col("r") * xs(i)).as(s"g$i"))
      val mom = scored.agg((hCells ++ gCells).head, (hCells ++ gCells).tail: _*)
      // Newton step inside the plan: 1-row β × 1-row moments
      beta = beta.crossJoin(mom).map { row =>
        def d(name: String) = row.getDouble(row.fieldIndex(name))
        val h = DenseMatrix.zeros[Double](5, 5)
        for (i <- 0 to 4; j <- i to 4) {
          h(i, j) = d(s"h${i}$j"); h(j, i) = h(i, j)
        }
        for (i <- 0 to 4) h(i, i) += 1e-6 // ridge: keeps H invertible
        val g = DenseVector.tabulate(5)(i => d(s"g$i"))
        val b = DenseVector.tabulate(5)(i => d(s"b$i"))
        val bn = b + (h \ g)
        (bn(0), bn(1), bn(2), bn(3), bn(4))
      }.toDF(bCols: _*)
    }
    beta
    }

    val betaF = betaKey.map(k => Memo.cached(k)(train())).getOrElse(train())
    feats.crossJoin(broadcast(betaF))
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-zCol)), 6))
      .select((col(idCol) +: carry.map(col)) :+
        col("score") :+ (col("score") >= 0.5).as("keep"): _*)
  }
}
