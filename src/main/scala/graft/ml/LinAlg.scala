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

  /** Symmetric eigendecomposition by cyclic Jacobi rotations — the
    * classic driver-side solver for the small (d×d) matrices graft's
    * one-pass second-moment aggregates produce (covariance / Gram).
    * Deterministic; O(d³) per sweep, converges quadratically. Returns
    * (eigenvalues descending, eigenvectors as ROWS in the same order),
    * each eigenvector unit-norm with its largest-|entry| coordinate
    * positive (a deterministic sign convention — eigenvectors are
    * otherwise sign-ambiguous).
    */
  def symEigen(
      aIn: Array[Array[Double]],
      tol: Double = 1e-12,
      maxSweeps: Int = 100
  ): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    require(aIn.forall(_.length == n), "symEigen needs a square matrix")
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300, aIn.map(_.map(math.abs).max).max)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }

    var sweep = 0
    while (sweep < maxSweeps && math.sqrt(offDiag()) > tol * scale) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val apq = a(p)(q)
            a(p)(p) -= t * apq
            a(q)(q) += t * apq
            a(p)(q) = 0.0
            a(q)(p) = 0.0
            var i = 0
            while (i < n) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - s * (aiq + tau * aip); a(p)(i) = a(i)(p)
                a(i)(q) = aiq + s * (aip - tau * aiq); a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - s * (viq + tau * vip)
              v(i)(q) = viq + s * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // sort descending; eigenvector k is COLUMN k of v — emit as rows
    val order = (0 until n).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { k =>
      val col = Array.tabulate(n)(i => v(i)(k))
      val m = col.indices.maxBy(i => math.abs(col(i)))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }
}
