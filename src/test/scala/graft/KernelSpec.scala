package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{LinAlg, SpecialFunctions => SF}

/** Golden tests for the §2.8 linear-algebra kernels against
  * independently computed values (numpy lstsq/eigh/qr+svd) and
  * published t-table constants. Tolerance 1e-9 relative for algebra,
  * 1e-6 for the special-function approximations (SURVEY §7.4.5).
  */
class KernelSpec extends AnyFunSuite {

  private val X = DenseMatrix(
    (1.0, 2.0, 0.5), (2.0, 1.0, 1.5), (3.0, 4.0, 2.5), (4.0, 3.0, 3.5),
    (5.0, 6.5, 4.0), (6.0, 5.5, 5.0), (7.0, 8.0, 6.5), (8.0, 7.5, 7.0))
  private val y = DenseVector(2.1, 3.9, 6.2, 8.1, 10.3, 11.9, 14.2, 16.1)

  private def close(a: Double, b: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b))),
      s"$a != $b (tol $tol)")

  test("OLS matches numpy normal equations (beta, SE, R2, t)") {
    val o = LinAlg.ols(X, y)
    val beta = Array(0.065, 1.8, 0.11, 0.11)
    val se = Array(0.112489197012, 0.188266949953, 0.038496031542, 0.195316694399)
    val t = Array(0.577833265118, 9.560892129253, 2.857437392771, 0.563187905357)
    (0 until 4).foreach { j =>
      close(o.beta(j), beta(j), 1e-8)
      close(o.se(j), se(j), 1e-8)
      close(o.t(j), t(j), 1e-8)
    }
    close(o.deviance, 0.044, 1e-8)
    close(o.r2, 0.9997407800164958, 1e-10)
    close(o.adjR2, 0.9995463650288676, 1e-10)
    assert(o.dof == 4)
    // CI must bracket beta symmetrically with the t(0.975, dof) quantile
    (0 until 4).foreach { j =>
      close(o.ciHi(j) - o.beta(j), o.beta(j) - o.ciLo(j), 1e-9)
    }
  }

  test("PCA matches numpy eigh (eigenvalues, sign-fixed vectors, explained)") {
    val r = LinAlg.pca(X, 3)
    val eig = Array(17.265913307553, 0.703557859233, 0.021600261786)
    val expl = Array(0.95969344439, 0.039105945526, 0.001200610084)
    val vecs = DenseMatrix(
      (0.582756243645, -0.423217616194, -0.69374491698),
      (0.602212861827, 0.798109845669, 0.018982710454),
      (0.545650831158, -0.42884440487, 0.719970587502))
    (0 until 3).foreach { j =>
      close(r.eigenvalues(j), eig(j), 1e-8)
      close(r.explained(j), expl(j), 1e-8)
      (0 until 3).foreach(i => close(r.coefficients(i, j), vecs(i, j), 1e-8))
    }
    close(r.cumulative(2), 1.0, 1e-9)
    // orthonormality
    val g = r.coefficients.t * r.coefficients
    (0 until 3).foreach(i => (0 until 3).foreach { j =>
      close(g(i, j), if (i == j) 1.0 else 0.0, 1e-9)
    })
  }

  test("CCA matches numpy QR+SVD (canonical correlations, weights)") {
    val a = DenseMatrix(
      (0.2, 1.1), (1.3, 0.4), (2.1, 2.2), (3.3, 2.9), (4.0, 4.4),
      (5.2, 5.1), (6.1, 6.6), (7.3, 7.2), (8.0, 8.9), (9.2, 9.4))
    val b = DenseMatrix(
      (0.5, 0.1), (1.0, 1.4), (2.4, 1.9), (2.9, 3.3), (4.5, 3.8),
      (5.0, 5.5), (6.6, 6.0), (7.1, 7.7), (8.8, 8.2), (9.3, 9.9))
    val cc = LinAlg.cca(a, b, 2)
    close(cc.r(0), 0.999637165418, 1e-9)
    close(cc.r(1), 0.782365924705, 1e-9)
    assert(cc.ridgeUsed == 0.0)
    // numpy weights sign-fixed per the engine convention (max-|entry| positive)
    val wa = DenseMatrix((0.273464570863, 1.907530858952), (0.05710878097, -1.822184237635))
    val wb = DenseMatrix((0.143416976793, -1.824121747399), (0.17320463446, 1.761317282051))
    (0 until 2).foreach { j =>
      (0 until 2).foreach { i =>
        close(cc.a(i, j), wa(i, j), 1e-8)
        close(cc.b(i, j), wb(i, j), 1e-8)
      }
    }
    // canoncorr scaling: projections have unit sample variance
    val ac = LinAlg.centered(a, LinAlg.colMeans(a))
    val u = ac * cc.a
    (0 until 2).foreach { j =>
      val col = u(::, j).toArray
      val m = col.sum / col.length
      val v = col.map(x => (x - m) * (x - m)).sum / (col.length - 1)
      close(v, 1.0, 1e-9)
    }
  }

  test("moments-path CCA holds at reference parameters (k=10 over 10+10 dims)") {
    // the reference runs 10 canonical components (oxford_single_session
    // _pipeline_mdl.m:61-63); prove the Cholesky/moments form agrees
    // with the data-path QR at that parameter scale, not just the k=3
    // fixture economy the default l7 uses
    val rnd = new scala.util.Random(42L)
    val n = 200
    val lat = Array.fill(n, 10)(rnd.nextGaussian())
    def side(shift: Int) = DenseMatrix.tabulate(n, 10) { (i, j) =>
      lat(i)((j + shift) % 10) * (1.0 + 0.1 * j) + 0.3 * rnd.nextGaussian()
    }
    val a = side(0); val b = side(3)
    val cc = LinAlg.cca(a, b, 10)
    // scatter blocks from the raw data — what the moment aggregate feeds
    val ac = LinAlg.centered(a, LinAlg.colMeans(a))
    val bc = LinAlg.centered(b, LinAlg.colMeans(b))
    val cm = LinAlg.ccaFromMoments(n, ac.t * ac, ac.t * bc, bc.t * bc, 10)
    assert(cm.r.length == 10 && cc.r.length == 10)
    (0 until 10).foreach { c =>
      close(cm.r(c), cc.r(c), 1e-8)
      (0 until 10).foreach { i => close(cm.a(i, c), cc.a(i, c), 1e-6) }
    }
    assert(cm.ridgeUsed == cc.ridgeUsed)
  }

  test("CCA ridge path engages on rank-deficient input and stays finite") {
    // second X column duplicates the first → rank deficient
    val a = DenseMatrix.zeros[Double](12, 2)
    val b = DenseMatrix.zeros[Double](12, 2)
    (0 until 12).foreach { i =>
      a(i, 0) = i.toDouble; a(i, 1) = 2.0 * i
      b(i, 0) = i.toDouble + (if (i % 2 == 0) 0.3 else -0.3); b(i, 1) = math.sin(i.toDouble)
    }
    val cc = LinAlg.cca(a, b, 2)
    assert(cc.ridgeUsed > 0.0)
    assert(cc.r.forall(r => r >= 0.0 && r <= 1.0))
    assert(cc.a.data.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("principal angles: identical subspace -> 0, orthogonal -> 90deg") {
    val e1 = DenseMatrix((1.0, 0.0), (0.0, 1.0), (0.0, 0.0), (0.0, 0.0))
    val e2 = DenseMatrix((0.0, 0.0), (0.0, 0.0), (1.0, 0.0), (0.0, 1.0))
    LinAlg.principalAngles(e1, e1).foreach(t => close(t, 0.0, 1e-9))
    LinAlg.principalAngles(e1, e2).foreach(t => close(t, math.Pi / 2, 1e-9))
  }

  test("exact Wilcoxon two-sided p against hand-computed distribution values") {
    import graft.functions.WilcoxonSignedRank.exactTwoSidedP
    // n=5: subset-sum counts over {1..5} are
    // [1,1,1,2,2,3,3,3,3,3,3,2,2,1,1,1] / 32
    assert(exactTwoSidedP(5, 15) == 2.0 / 32)   // all-positive extreme
    assert(exactTwoSidedP(5, 0) == 2.0 / 32)    // all-negative extreme
    assert(exactTwoSidedP(5, 10) == 20.0 / 32)  // P(<=10)=25/32, P(>=10)=10/32
    assert(exactTwoSidedP(5, 8) == 1.0)         // center: 2*16/32 capped at 1
    // n=6 all-positive: scipy wilcoxon([1,2,3,4,5,6]) -> 0.03125
    assert(exactTwoSidedP(6, 21) == 0.03125)
    // symmetry of the null distribution
    for (n <- 1 to 25; w <- Seq(0, n * (n + 1) / 4, n * (n + 1) / 2))
      assert(exactTwoSidedP(n, w) == exactTwoSidedP(n, n * (n + 1) / 2 - w))
    assertThrows[IllegalArgumentException](exactTwoSidedP(26, 0))
    assertThrows[IllegalArgumentException](exactTwoSidedP(5, 16))
  }

  test("t distribution against published table constants") {
    close(SF.tInv(0.975, 10), 2.228138852, 1e-6)
    close(SF.tInv(0.975, 5), 2.570581836, 1e-6)
    close(SF.tCdf(2.228138852, 10), 0.975, 1e-9)
    close(SF.tTwoSidedP(2.776445105, 4), 0.05, 1e-8)
    close(SF.tCdf(0.0, 7), 0.5, 1e-12)
    // symmetry
    close(SF.tCdf(-1.3, 9), 1.0 - SF.tCdf(1.3, 9), 1e-12)
  }

  test("normal CDF approximation") {
    close(SF.normCdf(0.0), 0.5, 1e-7)
    close(SF.normCdf(1.959963985), 0.975, 1e-6)
    close(SF.normCdf(-1.959963985), 0.025, 1e-6)
  }

  test("CCA CV uses contiguous folds and zero-pads undersized ones") {
    // strongly correlated pair: every valid fold's first canonical r ≈ 1
    val n = 50
    val a = DenseMatrix.tabulate(n, 2)((i, j) => i.toDouble + j * 0.1 + math.sin(i * 0.7 + j))
    val b = DenseMatrix.tabulate(n, 2)((i, j) => i.toDouble * 1.3 - j * 0.2 + math.cos(i * 0.7 + j))
    val folds = LinAlg.ccaCv(a, b, 2, 5)
    assert(folds.length == 5)
    folds.foreach { r => assert(r(0) > 0.9, r.mkString(",")) }
    // too many folds → tiny test slices (<3 rows) stay zero-padded, no throw
    val degenerate = LinAlg.ccaCv(a(0 until 8, ::).toDenseMatrix,
      b(0 until 8, ::).toDenseMatrix, 2, 5)
    assert(degenerate.length == 5)
    assert(degenerate.flatten.forall(v => !v.isInfinite))
  }

  test("PCA CV reconstruction error is positive and fold-stable on smooth data") {
    val n = 40
    val m = DenseMatrix.zeros[Double](n, 4)
    (0 until n).foreach { i =>
      m(i, 0) = math.sin(i * 0.1); m(i, 1) = math.cos(i * 0.1)
      m(i, 2) = math.sin(i * 0.1) * 0.5 + 0.01 * i; m(i, 3) = i * 0.02
    }
    val errs = LinAlg.pcaCvError(m, 2, 5)
    assert(errs.forall(e => e >= 0.0 && e < 1.0))
  }
}
