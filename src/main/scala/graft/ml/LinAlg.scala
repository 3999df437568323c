package graft.ml

/** Small dense linear algebra for driver-side k×k solves (k = number of
  * regressors, assumed small; all big-data reductions happen in Spark and
  * only Gram matrices reach the driver).
  *
  * Self-contained on purpose: deterministic, no native BLAS variance.
  */
object LinAlg {

  /** Solve A x = b by Gaussian elimination with partial pivoting.
    * A is k×k (row-major), b length k. A and b are not mutated.
    */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val k = b.length
    val m = Array.tabulate(k)(i => a(i).clone())
    val v = b.clone()
    var col = 0
    while (col < k) {
      // pivot
      var piv = col
      var best = math.abs(m(col)(col))
      var r = col + 1
      while (r < k) {
        val x = math.abs(m(r)(col))
        if (x > best) { best = x; piv = r }
        r += 1
      }
      if (best == 0.0)
        throw new IllegalArgumentException(
          s"singular system at column $col — use checkRank to drop collinear columns")
      if (piv != col) {
        val t = m(piv); m(piv) = m(col); m(col) = t
        val tv = v(piv); v(piv) = v(col); v(col) = tv
      }
      r = col + 1
      while (r < k) {
        val f = m(r)(col) / m(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < k) { m(r)(c) -= f * m(col)(c); c += 1 }
          v(r) -= f * v(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = v(i)
      var j = i + 1
      while (j < k) { s -= m(i)(j) * x(j); j += 1 }
      x(i) = s / m(i)(i)
      i -= 1
    }
    x
  }

  /** Inverse of A via k solves against unit vectors. */
  def inverse(a: Array[Array[Double]]): Array[Array[Double]] = {
    val k = a.length
    val cols = Array.tabulate(k) { j =>
      val e = new Array[Double](k); e(j) = 1.0
      solve(a, e)
    }
    Array.tabulate(k)(i => Array.tabulate(k)(j => cols(j)(i)))
  }

  /** Incremental rank-revealing pass over a Gram matrix G = X'X.
    *
    * Mirrors the semantics of the reference `find_collinear_cols`
    * (reference: hdfe/multicollinearity.py:50): walk columns left to
    * right; a column whose residual after projecting on the already-kept
    * columns is (numerically) zero is collinear. The reference runs QR on
    * X itself; at 100 TB X never fits on one machine, so graft works from
    * the k×k Gram matrix: the diagonal entry the QR would produce equals
    * the residual norm computable from G alone (Cholesky–Gram-Schmidt
    * identity). Columns are normalized by sqrt(G_jj) first, so `tol` is a
    * *relative* tolerance (default 1e-7 ≈ sqrt of the reference's 1e-12
    * absolute tolerance, reflecting the squared conditioning of the Gram
    * form).
    *
    * @return (collinear column indices, kept column indices), both in
    *         ascending order.
    */
  def collinearFromGram(
      g: Array[Array[Double]],
      tol: Double = 1e-7
  ): (Seq[Int], Seq[Int]) = {
    val k = g.length
    val d = Array.tabulate(k)(j => math.sqrt(math.max(g(j)(j), 0.0)))
    def gn(i: Int, j: Int): Double =
      if (d(i) == 0.0 || d(j) == 0.0) 0.0 else g(i)(j) / (d(i) * d(j))

    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val dropped = scala.collection.mutable.ArrayBuffer.empty[Int]
    // R columns for kept regressors: rCols(m) = column of R for kept(m),
    // length m+1 (upper triangular).
    val rCols = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]

    var j = 0
    while (j < k) {
      if (d(j) == 0.0) { dropped += j }
      else {
        val m = kept.length
        // z = R^{-T} * gn(kept, j)  (forward substitution on R transpose)
        val z = new Array[Double](m)
        var i = 0
        while (i < m) {
          var s = gn(kept(i), j)
          var t = 0
          while (t < i) { s -= rCols(i)(t) * z(t); t += 1 }
          z(i) = s / rCols(i)(i)
          i += 1
        }
        var zz = 0.0
        i = 0
        while (i < m) { zz += z(i) * z(i); i += 1 }
        val resid2 = 1.0 - zz
        if (resid2 < tol * tol) { dropped += j }
        else {
          val newCol = new Array[Double](m + 1)
          System.arraycopy(z, 0, newCol, 0, m)
          newCol(m) = math.sqrt(resid2)
          rCols += newCol
          kept += j
        }
      }
      j += 1
    }
    (dropped.toSeq, kept.toSeq)
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** y = A x for row-major A. */
  def matVec(a: Array[Array[Double]], x: Array[Double]): Array[Double] =
    a.map(row => dot(row, x))

  /** C = A B, row-major, any conformable shapes (m×k · k×n → m×n).
    * The square-only version this replaces silently truncated
    * rectangular inputs to the leading square block — for 2SLS that
    * meant an over-identified fit used only the first kx instruments.
    */
  def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val inner = b.length
    require(a.forall(_.length == inner), s"shape mismatch: A is ${a.length}×${a.headOption.map(_.length).getOrElse(0)}, B has $inner rows")
    Array.tabulate(a.length) { i =>
      Array.tabulate(b.head.length) { j =>
        var s = 0.0; var t = 0
        while (t < inner) { s += a(i)(t) * b(t)(j); t += 1 }
        s
      }
    }
  }
}
