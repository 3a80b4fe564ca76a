package graft.operators

/** Deterministic driver-side k-means (k-means++ init + Lloyd) for
  * fitting the IVF coarse quantizer on a bounded sample. At 100 TB the
  * quantizer is never fit on the corpus — a representative sample of a
  * few thousand vectors is collected and clustered locally (FAISS-style
  * train/assign split); only the ASSIGN pass touches the corpus.
  *
  * Fully deterministic: seeded RNG, fixed iteration count, ties broken
  * by lowest index. Empty clusters keep their previous center.
  */
object LocalKMeans {

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Number of fit() invocations this JVM — observability for the
    * "quantizers are fit once per snapshot, then served from the stored
    * index" contract (SemDedupSpec asserts a probe of an existing index
    * does not re-fit). */
  private[graft] val fitCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def fit(points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means fit set is empty")
    fitCount.incrementAndGet()
    val rng = new java.util.Random(seed)
    val n = points.length
    val kk = math.min(k, n)

    // k-means++ seeding
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rng.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val d = dist2(points(i), centers(c - 1))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      val total = minD2.sum
      // degenerate (all points identical): fall back to uniform pick
      var idx = 0
      if (total > 0.0) {
        var r = rng.nextDouble() * total
        while (idx < n - 1 && r > minD2(idx)) { r -= minD2(idx); idx += 1 }
      } else idx = rng.nextInt(n)
      centers(c) = points(idx).clone()
      c += 1
    }

    // Lloyd iterations
    val dim = points(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        var best = 0; var bestD = dist2(points(i), centers(0))
        var j = 1
        while (j < kk) {
          val d = dist2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        val s = sums(best); val p = points(i)
        var m = 0
        while (m < dim) { s(m) += p(m); m += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          val s = sums(j)
          var m = 0
          while (m < dim) { s(m) /= counts(j); m += 1 }
          centers(j) = s
        } // empty cluster: keep previous center
        j += 1
      }
      it += 1
    }
    centers
  }
}
