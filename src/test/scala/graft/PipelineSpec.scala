package graft

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.LinAlg
import graft.operators.RangeJoin

/** Golden end-to-end pipeline test (SURVEY §5.3): a deterministic
  * synthetic "session" runs the reference's entry-point-A chain —
  * event segmentation (range join) → PSTH aggregation → per-region
  * PCA → cross-region CCA → GLM — with the distributed stages in
  * Spark and the kernel stages in Breeze, exactly as the engine wires
  * them. PSTH values are checked against the analytically computed
  * expectation of the generator; kernel outputs against construction
  * invariants (the correlated-regions design forces high canonical
  * correlation and GLM fit).
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  // --- deterministic synthetic session ------------------------------
  private val nNeurons = 6   // per region
  private val tTotal = 400
  private val eventTimes = Seq(50L, 100L, 150L, 200L, 250L, 300L)
  private val (pre, post) = (5L, 10L)

  /** Region A: per-neuron sinusoid (distinct frequency per neuron, so
    * the trial matrix has full column rank) + an event-locked bump.
    * Region B: a fixed mixture of region A signals (so CCA/GLM have
    * real structure to find). Pure functions of (neuron, t). */
  private def rateA(n: Int, t: Long): Double = {
    val bump = eventTimes.map(e => t - e).find(d => d >= 0 && d <= 3)
      .map(_ => 1.5).getOrElse(0.0)
    math.sin((0.2 + 0.05 * n) * t + n) + bump + 0.1 * n
  }
  private def rateB(n: Int, t: Long): Double =
    (0 until nNeurons).map(m => rateA(m, t) * math.cos(n + m)).sum / nNeurons

  test("segment -> PSTH -> PCA -> CCA -> GLM end to end") {
    import spark.implicits._

    val rates =
      (for { n <- 0 until nNeurons; t <- 0L until tTotal } yield ("A", n, t, rateA(n, t))) ++
      (for { n <- 0 until nNeurons; t <- 0L until tTotal } yield ("B", n, t, rateB(n, t)))
    val ratesDf = rates.toDF("region", "neuron", "t", "rate")
    val eventsDf = eventTimes.zipWithIndex
      .map { case (tau, i) => (i.toLong, tau) }.toDF("trial_id", "tau")

    // 1. segmentation: every (event, window) pair, rel_off in [-pre, post]
    val seg = RangeJoin.segment(eventsDf, ratesDf, Seq.empty, "tau", "t", pre, post)
    val segN = seg.count()
    assert(segN == eventTimes.size.toLong * (pre + post + 1) * nNeurons * 2)

    // 2. PSTH: trial-averaged rate per (region, neuron, rel_off),
    //    checked against the analytic expectation of the generator
    val psth = seg.groupBy("region", "neuron", "rel_off")
      .agg(avg("rate").as("m"), stddev_samp(col("rate")).as("sd"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(psth.size == 2 * nNeurons * (pre + post + 1))
    for (n <- 0 until nNeurons; off <- -pre to post) {
      val expA = eventTimes.map(e => rateA(n, e + off)).sum / eventTimes.size
      val gotA = psth(("A", n, off))._1
      assert(math.abs(gotA - expA) < 1e-9, s"PSTH A n=$n off=$off")
      // the event-locked bump must show up after alignment, uniformly
      if (off >= 0 && off <= 3) {
        val gotSd = psth(("A", n, off))._2
        assert(!gotSd.isNaN)
      }
    }

    // 3. per-region trial matrices (trials*window rows x neurons),
    //    fixed row order (trial, rel_off) per SURVEY fold semantics
    def regionMatrix(region: String): DenseMatrix[Double] = {
      val rows = seg.filter(col("region") === region)
        .select("trial_id", "rel_off", "neuron", "rate")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2), r.getDouble(3)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, cells) =>
          cells.sortBy(_._2).map(_._3)
        }
      DenseMatrix(rows: _*)
    }
    val ma = regionMatrix("A")
    val mb = regionMatrix("B")
    assert(ma.rows == eventTimes.size * (pre + post + 1).toInt && ma.cols == nNeurons)

    // 4. PCA per region: orthonormal coefficients, variance accounted
    val pca = LinAlg.pca(ma, 3)
    assert(pca.explained.take(3).sum > 0.5)        // structured signal
    val g = pca.coefficients.t * pca.coefficients
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(g(i, j) - (if (i == j) 1.0 else 0.0)) < 1e-9)

    // 5. CCA across regions: B is a linear mixture of A, so the first
    //    canonical correlation must be ~1
    val cc = LinAlg.cca(ma, mb, 3)
    assert(cc.r(0) > 0.99, s"r=${cc.r.toSeq}")
    assert(cc.r.forall(r => r >= 0.0 && r <= 1.0 + 1e-12))

    // 6. GLM: regress B's first canonical variate on region A neurons —
    //    exact linear relationship => R² ~ 1, all stats finite
    val vb = LinAlg.centered(mb, LinAlg.colMeans(mb)) * cc.b
    val y = vb(::, 0).toArray
    val ols = LinAlg.ols(ma, breeze.linalg.DenseVector(y))
    assert(ols.r2 > 0.99, s"r2=${ols.r2}")
    assert(ols.beta.forall(b => !b.isNaN && !b.isInfinite))
    assert(ols.p.forall(p => p >= 0.0 && p <= 1.0))
  }
}
