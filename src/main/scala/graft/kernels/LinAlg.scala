package graft.kernels

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, qr, svd, inv, sum => bsum}

/** Local dense linear-algebra kernels for the per-group "UDAF layer"
  * (SURVEY §2.8). Each group is small (≤ ~10^2 columns × ~10^4 rows), so
  * the engine runs these inside `Dataset.groupByKey(...).mapGroups`
  * partitions — distributed across groups, dense within a group — the
  * Spark-idiomatic shape for the reference's per-(session, region, pair)
  * math (/root/reference/Matlab_part/perform_region_pca.m,
  * perform_session_cca.m, oxford_GLM_CCA_coefficients_extract.m:402-485).
  *
  * Determinism: all inputs are assembled in a caller-fixed row order;
  * eigen/SVD sign ambiguity is resolved by forcing the max-|loading|
  * entry of every component positive.
  */
object LinAlg {

  /** Fix the sign of each column: entry with max |value| made positive.
    * Returns the per-column flip factors applied (+1/-1). */
  def signFix(m: DenseMatrix[Double]): Array[Double] = {
    val flips = new Array[Double](m.cols)
    var j = 0
    while (j < m.cols) {
      var best = 0; var bestAbs = 0.0
      var i = 0
      while (i < m.rows) {
        val a = math.abs(m(i, j))
        if (a > bestAbs) { bestAbs = a; best = i }
        i += 1
      }
      val f = if (m(best, j) < 0) -1.0 else 1.0
      if (f < 0) { var i2 = 0; while (i2 < m.rows) { m(i2, j) = -m(i2, j); i2 += 1 } }
      flips(j) = f
      j += 1
    }
    flips
  }

  def colMeans(x: DenseMatrix[Double]): DenseVector[Double] = {
    val n = x.rows.toDouble
    val out = DenseVector.zeros[Double](x.cols)
    var j = 0
    while (j < x.cols) { out(j) = bsum(x(::, j)) / n; j += 1 }
    out
  }

  def centered(x: DenseMatrix[Double], mu: DenseVector[Double]): DenseMatrix[Double] = {
    val out = x.copy
    var j = 0
    while (j < x.cols) { var i = 0; while (i < x.rows) { out(i, j) -= mu(j); i += 1 }; j += 1 }
    out
  }

  // ------------------------------------------------------------------ PCA
  final case class PcaResult(
      coefficients: DenseMatrix[Double],  // p × k, orthonormal, sign-fixed
      eigenvalues: Array[Double],         // descending, length k
      explained: Array[Double],           // variance ratio, length k
      cumulative: Array[Double])

  /** PCA via eigendecomposition of the sample covariance (divisor n-1).
    * Mirrors /root/reference/Matlab_part/perform_region_pca.m:93-156. */
  def pca(x: DenseMatrix[Double], k: Int): PcaResult = {
    val n = x.rows
    require(n > 1, s"pca needs >1 rows, got $n")
    val xc = centered(x, colMeans(x))
    pcaFromCov((xc.t * xc) /:/ (n - 1).toDouble, k)
  }

  /** The eigendecomposition half of [[pca]], on an explicit covariance:
    * shared by the data path and the sufficient-statistics path. */
  def pcaFromCov(cov: DenseMatrix[Double], k: Int): PcaResult = {
    val es = eigSym(cov) // ascending eigenvalues
    val p = cov.rows
    val kk = math.min(k, p)
    val coeff = DenseMatrix.zeros[Double](p, kk)
    val ev = new Array[Double](kk)
    var j = 0
    while (j < kk) {
      val src = p - 1 - j // descending
      ev(j) = math.max(es.eigenvalues(src), 0.0)
      var i = 0
      while (i < p) { coeff(i, j) = es.eigenvectors(i, src); i += 1 }
      j += 1
    }
    signFix(coeff)
    val total = {
      var t = 0.0; var i = 0
      while (i < p) { t += math.max(es.eigenvalues(i), 0.0); i += 1 }
      if (t <= 0) 1.0 else t
    }
    val expl = ev.map(_ / total)
    val cum = expl.scanLeft(0.0)(_ + _).drop(1)
    PcaResult(coeff, ev, expl, cum)
  }

  /** PCA from sufficient statistics: sample covariance assembled as
    * (M − s·s'/n)/(n−1) from raw second moments M = X'X and column sums
    * s, then the identical eigen path as [[pca]]. The caller aggregates
    * (n, s, M) distributed; no task ever holds the data matrix. */
  def pcaFromMoments(n: Long, s: DenseVector[Double], m: DenseMatrix[Double],
      k: Int): PcaResult = {
    require(n > 1, s"pca needs >1 rows, got $n")
    val p = m.rows
    val cov = DenseMatrix.zeros[Double](p, p)
    var i = 0
    while (i < p) {
      var j = 0
      while (j < p) {
        cov(i, j) = (m(i, j) - s(i) * s(j) / n) / (n - 1).toDouble
        j += 1
      }
      i += 1
    }
    pcaFromCov(cov, k)
  }

  /** k-fold CV reconstruction error for PCA: train on the fold
    * complement, mean squared reconstruction error on the held-out fold.
    * Contiguous fold slices over the caller-fixed row order — the
    * reference's fold semantics (perform_region_pca.m:98-115). */
  def pcaCvError(x: DenseMatrix[Double], k: Int, nFolds: Int): Array[Double] = {
    val n = x.rows
    val errs = new Array[Double](nFolds)
    var f = 0
    while (f < nFolds) {
      val lo = (f.toLong * n / nFolds).toInt
      val hi = ((f + 1).toLong * n / nFolds).toInt
      val testIdx = (lo until hi).toArray
      val trainIdx = ((0 until lo) ++ (hi until n)).toArray
      if (testIdx.nonEmpty && trainIdx.length > 1) {
        val xtr = x(trainIdx.toIndexedSeq, ::).toDenseMatrix
        val xte = x(testIdx.toIndexedSeq, ::).toDenseMatrix
        val mu = colMeans(xtr)
        val w = pca(xtr, k).coefficients
        val xteC = centered(xte, mu)
        val recon = xteC * (w * w.t)
        val diff = xteC - recon
        var s = 0.0
        var i = 0
        while (i < diff.rows) { var j = 0; while (j < diff.cols) { val d = diff(i, j); s += d * d; j += 1 }; i += 1 }
        errs(f) = s / (diff.rows * diff.cols)
      }
      f += 1
    }
    errs
  }

  // ------------------------------------------------------------------ CCA
  final case class CcaResult(
      a: DenseMatrix[Double],   // p × k canonical weights for X
      b: DenseMatrix[Double],   // q × k canonical weights for Y
      r: Array[Double],         // canonical correlations, descending
      ridgeUsed: Double)        // 0.0 when plain QR path succeeded

  /** Canonical correlation analysis, Björck–Golub QR+SVD formulation
    * (the algorithm behind MATLAB canoncorr). Rank-deficiency is handled
    * the way the reference does: augment [X; √λ·I] (Y rows padded with
    * zeros), escalate λ ×10 up to 5 attempts
    * (/root/reference/Matlab_part/perform_session_cca.m:270-400).
    * Weights follow canoncorr's scaling: Xc·A has unit sample variance. */
  def cca(x: DenseMatrix[Double], y: DenseMatrix[Double], k: Int): CcaResult = {
    require(x.rows == y.rows, "row mismatch")
    val n = x.rows
    val xc = centered(x, colMeans(x))
    val yc = centered(y, colMeans(y))

    def attempt(lambda: Double): Option[CcaResult] = {
      val (xa, ya) =
        if (lambda == 0.0) (xc, yc)
        else {
          val rl = math.sqrt(lambda)
          (DenseMatrix.vertcat(xc, DenseMatrix.eye[Double](xc.cols) *:* rl),
           DenseMatrix.vertcat(yc,
             DenseMatrix.zeros[Double](xc.cols, yc.cols)))
        }
      val (xb, yb) =
        if (lambda == 0.0) (xa, ya)
        else {
          val rl = math.sqrt(lambda)
          (DenseMatrix.vertcat(xa, DenseMatrix.zeros[Double](yc.cols, xc.cols)),
           DenseMatrix.vertcat(ya, DenseMatrix.eye[Double](yc.cols) *:* rl))
        }
      val qrx = qr.reduced(xb)
      val qry = qr.reduced(yb)
      val dx = (0 until qrx.r.rows).map(i => math.abs(qrx.r(i, i)))
      val dy = (0 until qry.r.rows).map(i => math.abs(qry.r(i, i)))
      val tolx = dx.max * xb.rows * 2.2e-16
      val toly = dy.max * yb.rows * 2.2e-16
      if (dx.min <= tolx || dy.min <= toly) None
      else {
        val s = svd.reduced(qrx.q.t * qry.q)
        val kk = math.min(k, math.min(x.cols, y.cols))
        val scale = math.sqrt((n - 1).toDouble)
        val aFull = inv(qrx.r) * s.leftVectors
        val bFull = inv(qry.r) * s.rightVectors.t
        val a = aFull(::, 0 until kk).toDenseMatrix *:* scale
        val b = bFull(::, 0 until kk).toDenseMatrix *:* scale
        // joint sign fix: A drives, B follows so corr(Xa, Yb) keeps sign
        val flips = signFix(a)
        var j = 0
        while (j < b.cols) {
          if (flips(j) < 0) { var i = 0; while (i < b.rows) { b(i, j) = -b(i, j); i += 1 } }
          j += 1
        }
        val r = (0 until kk).map(i => math.min(1.0, math.max(0.0, s.singularValues(i)))).toArray
        Some(CcaResult(a, b, r, lambda))
      }
    }

    var lambda = 0.0
    var out: Option[CcaResult] = attempt(0.0)
    var tries = 0
    while (out.isEmpty && tries < 5) {
      lambda = if (lambda == 0.0) 1e-6 else lambda * 10
      out = attempt(lambda)
      tries += 1
    }
    out.getOrElse(throw new IllegalStateException(
      s"CCA failed after ridge escalation to lambda=$lambda"))
  }

  /** CCA from sufficient statistics: the same Björck–Golub
    * factorization as [[cca]], run on upper Cholesky factors of the
    * CENTERED scatter blocks (Sxx = Xc'Xc etc). R from chol(Sxx)
    * equals qr(Xc).r up to row signs, and the sign ambiguity cancels
    * in A/B/r (D-absorption through the SVD), so results match the
    * data path to factorization round-off. The ridge escalation adds
    * λI to the scatter — EXACTLY what [[cca]]'s [X; √λ·I] row
    * augmentation produces — and the rank tolerance mirrors the QR
    * diagonal check (chol diag = |qr diag| in exact arithmetic),
    * including the augmented row count. */
  def ccaFromMoments(n: Long, sxx: DenseMatrix[Double], sxy: DenseMatrix[Double],
      syy: DenseMatrix[Double], k: Int): CcaResult = {
    val px = sxx.rows; val py = syy.rows

    def attempt(lambda: Double): Option[CcaResult] = {
      val axx = if (lambda == 0.0) sxx
        else sxx + DenseMatrix.eye[Double](px) *:* lambda
      val ayy = if (lambda == 0.0) syy
        else syy + DenseMatrix.eye[Double](py) *:* lambda
      val rows = if (lambda == 0.0) n else n + px + py
      val (rx, ry) = try {
        (breeze.linalg.cholesky(axx).t, breeze.linalg.cholesky(ayy).t)
      } catch { case _: Exception => return None } // not PD → rank-deficient
      val dx = (0 until px).map(i => math.abs(rx(i, i)))
      val dy = (0 until py).map(i => math.abs(ry(i, i)))
      val tolx = dx.max * rows * 2.2e-16
      val toly = dy.max * rows * 2.2e-16
      if (dx.min <= tolx || dy.min <= toly) None
      else {
        val m = inv(rx.t) * sxy * inv(ry) // Qx'Qy of the data path
        val s = svd.reduced(m)
        val kk = math.min(k, math.min(px, py))
        val scale = math.sqrt((n - 1).toDouble)
        val aFull = inv(rx) * s.leftVectors
        val bFull = inv(ry) * s.rightVectors.t
        val a = aFull(::, 0 until kk).toDenseMatrix *:* scale
        val b = bFull(::, 0 until kk).toDenseMatrix *:* scale
        val flips = signFix(a)
        var j = 0
        while (j < b.cols) {
          if (flips(j) < 0) { var i = 0; while (i < b.rows) { b(i, j) = -b(i, j); i += 1 } }
          j += 1
        }
        val r = (0 until kk).map(i => math.min(1.0, math.max(0.0, s.singularValues(i)))).toArray
        Some(CcaResult(a, b, r, lambda))
      }
    }

    var lambda = 0.0
    var out: Option[CcaResult] = attempt(0.0)
    var tries = 0
    while (out.isEmpty && tries < 5) {
      lambda = if (lambda == 0.0) 1e-6 else lambda * 10
      out = attempt(lambda)
      tries += 1
    }
    out.getOrElse(throw new IllegalStateException(
      s"CCA failed after ridge escalation to lambda=$lambda"))
  }

  /** k-fold CV canonical correlation: train CCA on fold complement,
    * evaluate corr(X_test·a_i, Y_test·b_i) per component. Contiguous
    * folds (perform_session_cca.m:275-295). Missing components (when a
    * fold's rank drops) are zero-padded like the reference. */
  def ccaCv(x: DenseMatrix[Double], y: DenseMatrix[Double], k: Int, nFolds: Int): Array[Array[Double]] = {
    val n = x.rows
    val res = Array.fill(nFolds)(new Array[Double](k))
    var f = 0
    while (f < nFolds) {
      val lo = (f.toLong * n / nFolds).toInt
      val hi = ((f + 1).toLong * n / nFolds).toInt
      val te = (lo until hi).toArray
      val tr = ((0 until lo) ++ (hi until n)).toArray
      if (te.length > 2 && tr.length > math.max(x.cols, y.cols) + 1) {
        val cc = cca(x(tr.toIndexedSeq, ::).toDenseMatrix, y(tr.toIndexedSeq, ::).toDenseMatrix, k)
        val xt = x(te.toIndexedSeq, ::).toDenseMatrix
        val yt = y(te.toIndexedSeq, ::).toDenseMatrix
        val u = xt * cc.a
        val v = yt * cc.b
        var c = 0
        while (c < math.min(k, cc.r.length)) {
          res(f)(c) = pearson(u(::, c).toArray, v(::, c).toArray)
          c += 1
        }
      }
      f += 1
    }
    res
  }

  def pearson(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    if (n < 2) return Double.NaN
    var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) { sa += a(i); sb += b(i); i += 1 }
    val ma = sa / n; val mb = sb / n
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    i = 0
    while (i < n) {
      val da = a(i) - ma; val db = b(i) - mb
      sab += da * db; saa += da * da; sbb += db * db
      i += 1
    }
    if (saa <= 0 || sbb <= 0) 0.0 else sab / math.sqrt(saa * sbb)
  }

  // ------------------------------------------------------------------ OLS
  final case class OlsResult(
      beta: Array[Double],      // includes intercept at index 0
      se: Array[Double],
      t: Array[Double],
      p: Array[Double],
      ciLo: Array[Double],
      ciHi: Array[Double],
      r2: Double,
      adjR2: Double,
      aic: Double,
      bic: Double,
      deviance: Double,         // RSS (gaussian deviance, glmfit convention)
      dof: Int)

  /** OLS with the full glmfit-style stats block
    * (/root/reference/Matlab_part/oxford_GLM_CCA_coefficients_extract.m:402-485):
    * β, SE, t, two-sided p, 95% CI (tinv), R², adj-R², AIC/BIC (gaussian
    * log-likelihood convention), deviance=RSS.
    * X is n × p WITHOUT intercept column; one is prepended here. */
  def ols(x: DenseMatrix[Double], y: DenseVector[Double]): OlsResult = {
    val n = x.rows
    val p = x.cols + 1
    require(n > p, s"OLS needs n > p ($n <= $p)")
    val xd = DenseMatrix.horzcat(DenseMatrix.ones[Double](n, 1), x)
    val xtx = xd.t * xd
    val xtxInv = inv(xtx)
    val beta = xtxInv * (xd.t * y)
    val resid = y - xd * beta
    val rss = {
      var s = 0.0; var i = 0
      while (i < n) { s += resid(i) * resid(i); i += 1 }
      s
    }
    val ym = bsum(y) / n
    val tss = {
      var s = 0.0; var i = 0
      while (i < n) { val d = y(i) - ym; s += d * d; i += 1 }
      s
    }
    val dof = n - p
    val sigma2 = rss / dof
    val se = (0 until p).map(j => math.sqrt(math.max(xtxInv(j, j), 0.0) * sigma2)).toArray
    val bArr = beta.toArray
    val tArr = (0 until p).map(j => if (se(j) > 0) bArr(j) / se(j) else Double.NaN).toArray
    val pArr = tArr.map(tv => SpecialFunctions.tTwoSidedP(tv, dof.toDouble))
    val tc = SpecialFunctions.tInv(0.975, dof.toDouble)
    val ciLo = (0 until p).map(j => bArr(j) - tc * se(j)).toArray
    val ciHi = (0 until p).map(j => bArr(j) + tc * se(j)).toArray
    val r2 = if (tss > 0) 1.0 - rss / tss else 0.0
    val adjR2 = 1.0 - (1.0 - r2) * (n - 1).toDouble / dof
    // Gaussian log-likelihood with MLE variance rss/n:
    val ll = -0.5 * n * (math.log(2 * math.Pi * rss / n) + 1.0)
    val kParams = p + 1 // coefficients + variance
    val aic = -2 * ll + 2.0 * kParams
    val bic = -2 * ll + math.log(n.toDouble) * kParams
    OlsResult(bArr, se, tArr, pArr, ciLo, ciHi, r2, adjR2, aic, bic, rss, dof)
  }

  /** OLS from per-group sufficient statistics — the scale-safe twin of
    * [[ols]]: `xtx` is the (p+1)×(p+1) normal matrix WITH the intercept
    * row/col (so xtx(0,0) = n), `xty` the matching moment vector
    * (xty(0) = Σy), `yty` = Σy². The caller aggregates the moments
    * distributed (order-invariant decimal sums — see
    * functions.Deterministic.stableSumGuarded); only these O(p²)
    * numbers ever leave the aggregation, so group SIZE never
    * materializes on a task. Identical stats block to [[ols]];
    * rss = y'y − 2β'X'y + β'(X'X)β is exact for any β, and with
    * exactly-accumulated moments agrees with the residual-pass
    * formulation to ~1e-12 relative (independent cross-check:
    * tools/check_kernels.py). */
  def olsFromMoments(xtx: DenseMatrix[Double], xty: DenseVector[Double],
      yty: Double, nRows: Long): OlsResult = {
    val p = xtx.rows
    val n = nRows.toDouble
    require(nRows > p, s"OLS needs n > p ($nRows <= $p)")
    val xtxInv = inv(xtx)
    val beta = xtxInv * xty
    val rss = math.max(yty - 2.0 * (beta dot xty) + (beta dot (xtx * beta)), 0.0)
    val ym = xty(0) / n
    val tss = math.max(yty - n * ym * ym, 0.0)
    val dof = (nRows - p).toInt
    val sigma2 = rss / dof
    val se = (0 until p).map(j => math.sqrt(math.max(xtxInv(j, j), 0.0) * sigma2)).toArray
    val bArr = beta.toArray
    val tArr = (0 until p).map(j => if (se(j) > 0) bArr(j) / se(j) else Double.NaN).toArray
    val pArr = tArr.map(tv => SpecialFunctions.tTwoSidedP(tv, dof.toDouble))
    val tc = SpecialFunctions.tInv(0.975, dof.toDouble)
    val ciLo = (0 until p).map(j => bArr(j) - tc * se(j)).toArray
    val ciHi = (0 until p).map(j => bArr(j) + tc * se(j)).toArray
    val r2 = if (tss > 0) 1.0 - rss / tss else 0.0
    val adjR2 = 1.0 - (1.0 - r2) * (n - 1) / dof
    val ll = -0.5 * n * (math.log(2 * math.Pi * rss / n) + 1.0)
    val kParams = p + 1
    val aic = -2 * ll + 2.0 * kParams
    val bic = -2 * ll + math.log(n) * kParams
    OlsResult(bArr, se, tArr, pArr, ciLo, ciHi, r2, adjR2, aic, bic, rss, dof)
  }

  // -------------------------------------------------- principal angles
  /** Principal angles between the column spaces of a and b (radians,
    * ascending): orthonormalize via QR, SVD of Q1ᵀQ2, θ=acos(σ).
    * Ref: /root/reference/History/2025-01-19-PCA-single-trial-level/
    * Pca_cca_comparison_framework.py:81-158. */
  def principalAngles(a: DenseMatrix[Double], b: DenseMatrix[Double]): Array[Double] = {
    val qa = qr.reduced(a).q
    val qb = qr.reduced(b).q
    val s = svd.reduced(qa.t * qb)
    s.singularValues.toArray.map(v => math.acos(math.min(1.0, math.max(-1.0, v))))
  }
}
