package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite
import graft.stats.{BSpline, Estimators, LinAlg}

/** Property-based invariants (SURVEY.md §5.2): pooling algebra,
  * sandwich positive-definiteness, B-spline partition of unity —
  * checked over many seeded random instances. Driver-side Breeze.
  */
class PropertySpec extends AnyFunSuite {

  private def forSeeds(n: Int)(f: Long => Unit): Unit = (0 until n).foreach(i => f(i.toLong))

  private def randSpd(n: Int, seed: Long): DenseMatrix[Double] = {
    val rng = new scala.util.Random(seed)
    val a = DenseMatrix.tabulate(n, n)((_, _) => rng.nextGaussian())
    a * a.t + DenseMatrix.eye[Double](n) * 0.5
  }

  test("equal-weight pooling of two identical blocks returns the block") {
    forSeeds(50) { seed =>
      val rng = new scala.util.Random(seed)
      val b = DenseVector(rng.nextGaussian(), rng.nextGaussian())
      val stacked = DenseVector.vertcat(b, b)
      val v = randSpd(4, seed)
      val (pooled, _) = Estimators.Pooling.kroneckerLike(
        stacked, v, DenseMatrix.eye[Double](2) * 0.5)
      assert(breeze.linalg.norm(pooled - b) < 1e-12)
    }
  }

  test("full pooling with block-diagonal precision = inverse-variance weighting") {
    forSeeds(50) { seed =>
      val rng = new scala.util.Random(seed)
      val v1 = randSpd(2, seed); val v2 = randSpd(2, seed + 1)
      val v = DenseMatrix.zeros[Double](4, 4)
      v(0 until 2, 0 until 2) := v1
      v(2 until 4, 2 until 4) := v2
      val b1 = DenseVector(rng.nextGaussian(), rng.nextGaussian())
      val b2 = DenseVector(rng.nextGaussian(), rng.nextGaussian())
      val (pooled, vp) = Estimators.Pooling.full(DenseVector.vertcat(b1, b2), v, 2, 2)
      val lam1 = LinAlg.cholInv(v1); val lam2 = LinAlg.cholInv(v2)
      val expect = LinAlg.cholInv(lam1 + lam2) * (lam1 * b1 + lam2 * b2)
      assert(breeze.linalg.norm(pooled - expect) < 1e-8)
      // pooled variance of independent blocks = (Λ1+Λ2)^-1, and is SPD
      val expectVar = LinAlg.cholInv(lam1 + lam2)
      assert(breeze.linalg.max(breeze.numerics.abs(vp - expectVar)) < 1e-8)
      breeze.linalg.cholesky(vp) // throws if not PD
    }
  }

  test("sandwichStep output is symmetric PSD for SPD hessian and meat") {
    forSeeds(50) { seed =>
      val h = randSpd(5, seed)
      val meat = randSpd(5, seed + 7)
      val s = LinAlg.sandwichStep(h, meat, nUsers = 50, d = 5)
      assert(breeze.linalg.max(breeze.numerics.abs(s - s.t)) < 1e-10)
      breeze.linalg.cholesky(s + DenseMatrix.eye[Double](5) * 1e-12)
    }
  }

  test("B-spline basis + implicit first function form a partition of unity") {
    // bs() drops the first basis function; the FULL basis sums to 1 on
    // the interior — reconstruct the dropped one as 1 - sum(rest) >= 0
    forSeeds(100) { seed =>
      val rng = new scala.util.Random(seed)
      val xs: Array[Double] = Array.fill(30)(rng.nextGaussian() * 2.5)
      val lo = xs.min; val hi = xs.max
      val mid = lo + (hi - lo) * rng.nextDouble()
      val knots = Array(lo, lo, lo, (lo + hi) / 2, hi, hi, hi)
      val sp = BSpline(knots, degree = 2, nBasis = 3)
      val b = sp.basis(mid)
      val total = b.sum
      assert(total <= 1.0 + 1e-9, s"basis sum $total > 1 at $mid")
      assert(b.forall(v => v >= -1e-12), s"negative basis value at $mid")
    }
  }
}
