package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** The two-level centroid fit ([[IvfIndex.hierLloyd]]) — the O(n·√k·d)
  * large-nlist path. Pure-JVM: no Spark session needed. The flat path
  * below [[IvfIndex.TwoLevelNlist]] is untouched (every oracle gate runs
  * it), so these tests pin the two-level path's contracts directly:
  * exact centroid count, determinism (oracle refit-and-embed depends on
  * it), and quantization quality within a bounded factor of flat Lloyd
  * on the same sample. */
class HierLloydSpec extends AnyFunSuite {

  private val dim = 16
  private def corpus(n: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(7) // fixed seed: deterministic corpus
    Array.fill(n) {
      // 32 latent clusters + noise, so k-means has real structure to find
      val c = rnd.nextInt(32)
      Array.tabulate(dim)(f => ((c >> (f % 5)) & 1) * 2f + rnd.nextFloat())
    }
  }

  private def quantErr(xs: Array[Array[Float]], cents: Array[Array[Float]]): Double = {
    var tot = 0.0
    for (x <- xs) {
      var best = Double.MaxValue
      for (ct <- cents) {
        var s = 0.0; var i = 0
        while (i < dim) { val t = x(i).toDouble - ct(i); s += t * t; i += 1 }
        if (s < best) best = s
      }
      tot += best
    }
    tot / xs.length
  }

  test("exact centroid count, all drawn from occupied space, deterministic") {
    val xs = corpus(8000)
    val k = 1200 // ≥ TwoLevelNlist would route here via fitCentroids
    val a = IvfIndex.hierLloyd(xs, k, iters = 3)
    assert(a.length === k)
    assert(a.forall(_.length == dim))
    val b = IvfIndex.hierLloyd(xs, k, iters = 3)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "hierLloyd must be bit-deterministic (oracle refit-and-embed)")
  }

  test("quantization error within 1.5x of flat Lloyd at the same k") {
    val xs = corpus(6000)
    val k = 1024
    val flat = IvfIndex.lloyd(xs, k, iters = 3)
    val hier = IvfIndex.hierLloyd(xs, k, iters = 3)
    val (ef, eh) = (quantErr(xs, flat), quantErr(xs, hier))
    info(f"quant err flat=$ef%.4f hier=$eh%.4f ratio=${eh / ef}%.2f")
    assert(eh <= ef * 1.5,
      f"two-level quality gave up too much: $eh%.4f vs flat $ef%.4f")
  }

  test("routing threshold: fitCentroids-sized ks below 1024 use flat Lloyd") {
    // contract pin: the threshold constant the routing decision reads
    assert(IvfIndex.TwoLevelNlist === 1024)
  }

  test("handles k close to n (every point its own cell)") {
    val xs = corpus(1300)
    val cents = IvfIndex.hierLloyd(xs, 1250, iters = 2)
    assert(cents.length === 1250)
  }
}
