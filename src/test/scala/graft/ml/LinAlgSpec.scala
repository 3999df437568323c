package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class LinAlgSpec extends AnyFunSuite {

  test("solve recovers known solution") {
    val a = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val b = Array(1.0, 2.0)
    val x = LinAlg.solve(a, b)
    // 4x + y = 1; x + 3y = 2  =>  x = 1/11, y = 7/11
    assert(math.abs(x(0) - 1.0 / 11) < 1e-12)
    assert(math.abs(x(1) - 7.0 / 11) < 1e-12)
  }

  test("solve handles pivoting (zero on diagonal)") {
    val a = Array(Array(0.0, 1.0), Array(1.0, 0.0))
    val x = LinAlg.solve(a, Array(3.0, 5.0))
    assert(x.toSeq == Seq(5.0, 3.0))
  }

  test("inverse times matrix is identity") {
    val a = Array(Array(2.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 4.0))
    val id = LinAlg.matMul(a, LinAlg.inverse(a))
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(id(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-12)
  }

  test("collinearFromGram flags exact duplicate and linear combo") {
    // columns: a, b, a+b, c  => col 2 collinear
    // Gram for a=(1,0,0), b=(0,1,0), c=(0,0,1) style small design:
    val cols = Seq(
      Array(1.0, 2.0, 3.0, 4.0),
      Array(0.0, 1.0, 1.0, 2.0),
      Array(1.0, 3.0, 4.0, 6.0), // a + b
      Array(5.0, 1.0, 2.0, 0.0)
    )
    val k = cols.length
    val g = Array.tabulate(k, k)((i, j) => cols(i).zip(cols(j)).map { case (x, y) => x * y }.sum)
    val (dropped, kept) = LinAlg.collinearFromGram(g)
    assert(dropped == Seq(2))
    assert(kept == Seq(0, 1, 3))
  }

  test("collinearFromGram keeps full-rank design intact (reference: 'Full rank' path)") {
    val cols = Seq(Array(1.0, 0.0, 1.0), Array(0.0, 1.0, 1.0), Array(1.0, 1.0, 0.0))
    val k = cols.length
    val g = Array.tabulate(k, k)((i, j) => cols(i).zip(cols(j)).map { case (x, y) => x * y }.sum)
    val (dropped, kept) = LinAlg.collinearFromGram(g)
    assert(dropped.isEmpty && kept == Seq(0, 1, 2))
  }

  test("collinearFromGram drops zero column") {
    val g = Array(
      Array(1.0, 0.0),
      Array(0.0, 0.0)
    )
    val (dropped, kept) = LinAlg.collinearFromGram(g)
    assert(dropped == Seq(1) && kept == Seq(0))
  }

  test("symEigen: hand-solved 2x2") {
    // [[2,1],[1,2]] has eigenvalues 3 (vector [1,1]/√2) and 1 ([1,-1]/√2)
    val (vals, vecs) = LinAlg.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r2) < 1e-12 && math.abs(vecs(0)(1) - r2) < 1e-12)
    // sign convention: largest-|entry| coordinate positive
    assert(math.abs(math.abs(vecs(1)(0)) - r2) < 1e-12)
    assert(vecs(1).map(math.abs).max == vecs(1).map(math.abs).max.abs)
  }

  test("symEigen: reconstruction, orthonormality, descending order on a 6x6") {
    val n = 6
    val a = Array.tabulate(n, n)((i, j) => 0.0)
    // deterministic symmetric matrix
    for (i <- 0 until n; j <- i until n) {
      val v = math.sin(i * 2.3 + j * 1.7) + (if (i == j) 3.0 + i else 0.0)
      a(i)(j) = v; a(j)(i) = v
    }
    val (vals, vecs) = LinAlg.symEigen(a)
    // descending
    for (i <- 1 until n) assert(vals(i - 1) >= vals(i) - 1e-12)
    // orthonormal rows
    for (i <- 0 until n; j <- 0 until n) {
      val d = LinAlg.dot(vecs(i), vecs(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-10, s"dot($i,$j)=$d")
    }
    // A = Σ λ_k u_k u_kᵀ
    for (i <- 0 until n; j <- 0 until n) {
      val r = (0 until n).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(r - a(i)(j)) < 1e-9, s"recon($i,$j)")
    }
    // trace preserved
    assert(math.abs(vals.sum - (0 until n).map(i => a(i)(i)).sum) < 1e-9)
  }
}
