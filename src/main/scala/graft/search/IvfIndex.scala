package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Unboxed nearest-centroid kernels, called from generated code. */
object IvfKernels {
  /** Ids of the `n` nearest centroids to `v` by L2 (ascending). On
    * normalized vectors L2 order equals cosine order, so one quantizer
    * serves all metrics — the same simplification faiss's IVF makes. */
  def nearest(v: ArrayData, centroids: Array[Array[Float]], n: Int): ArrayData = {
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var s = 0.0; var i = 0
      while (i < cent.length) {
        val d = v.getFloat(i).toDouble - cent(i); s += d * d; i += 1
      }
      dists(c) = s; c += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < m) {
      var best = -1; var bestD = Double.MaxValue
      c = 0
      while (c < k) {
        if (!taken(c) && dists(c) < bestD) { best = c; bestD = dists(c) }
        c += 1
      }
      taken(best) = true; out(j) = best; j += 1
    }
    new GenericArrayData(out.map(Int.box))
  }
}

/** Codegen'd expression: `n` nearest centroid ids for a vector. The centroid
  * matrix rides along as a plan reference object (broadcast-in-codegen), not
  * a per-row closure — stays inside whole-stage codegen. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    IvfKernels.nearest(v.asInstanceOf[ArrayData], centroids, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.search.IvfKernels.nearest($c, $ref, $n)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

/**
 * IVF-style approximate search: k-means the corpus into `nlist` cells at
 * fit time (the analog of faiss's coarse quantizer, faiss index_factory
 * "IVFn,Flat" — /root/reference/backend/faiss_searcher.py:100-107), store
 * each row's cell id, and at query time scan only the `nprobe` nearest
 * cells. On a cluster the cells are co-partitioned (`repartition(cellId)`),
 * so a query touches nprobe/nlist of the data — the partition-pruning that
 * makes 100 TB similarity search tractable where brute force isn't.
 */
object IvfIndex {
  private[search] val CID = "__cell"
  private val MaxTrainRows = 100000L
  /** faiss warns below ~39 training points per centroid
    * (clustering.cpp's min_points_per_centroid); the sample target scales
    * with the resolved nlist so large auto-nlist (up to 65,536 at corpus
    * scale) still trains each centroid on ≥ this many points. */
  private[search] val MinPointsPerCentroid = 39L
  /** Hard cap on the driver-side training collect: 4M rows ≈ 2 GB at
    * dim=128 float32 — bounded regardless of nlist (65,536 · 39 ≈ 2.6M
    * stays under it; anything larger is clamped and logged). */
  private[search] val TrainRowsCap = 4000000L

  /** Training-sample target for a resolved nlist: ≥100k rows (the classic
    * IVF recipe) and ≥39·nlist (so centroids don't starve as auto-nlist
    * grows), capped at [[TrainRowsCap]]. */
  private[search] def trainTarget(nlist: Int): Long =
    math.min(math.max(MaxTrainRows, MinPointsPerCentroid * nlist), TrainRowsCap)

  /** Above this many centroids the fit goes two-level ([[hierLloyd]]):
    * flat Lloyd assignment is O(n·k·d) per iteration, and with the sample
    * itself scaling as 39·k the flat fit is quadratic in k — the sf10
    * probe measured exactly this on the blocked-dedup path (nlist=3125).
    * Two-level is O(n·√k·d): the standard large-nlist recipe (faiss's
    * two-level clustering / HNSW coarse quantizers exist for the same
    * reason). Below the threshold the flat path is kept bit-identical —
    * every oracle gate fits well under it. */
  private[search] val TwoLevelNlist = 1024

  def nearestCentroidsCol(v: Column, cents: Array[Array[Float]], n: Int): Column =
    column(NearestCentroids(expression(v), cents, n))

  /** K-means centroids on a bounded sample of the vectors, Lloyd-iterated
    * ON THE DRIVER. Training the coarse quantizer on a bounded sample is
    * the standard IVF recipe (faiss does exactly this): at 100 TB the
    * sample is one narrow collect, the Lloyd iterations are local
    * arithmetic, and the cluster never runs the 10+ tiny jobs a
    * distributed k-means would schedule per iteration. The sample target
    * scales with nlist ([[trainTarget]]: max(100k, 39·nlist), capped at
    * 4M) so a 65,536-cell auto-nlist still sees ~39 points per centroid
    * instead of starving at a fixed 100k (1.5/centroid). Deterministic:
    * fixed-seed sample, k-means++-lite init from the sample order. */
  def fitCentroids(df: DataFrame, vecCol: String, nlist: Int, total: Long): Array[Array[Float]] = {
    // callers resolve auto-sizing (IndexStrategy.resolveNlist / the dedup
    // occupancy formula) BEFORE this point; nlist=0 here would degenerate
    // to a zero-centroid Lloyd, so fail fast instead
    require(nlist > 0, s"fitCentroids needs a resolved nlist > 0, got $nlist")
    val target = trainTarget(nlist)
    val fraction = if (total <= target) 1.0 else target.toDouble / total
    val sample = (if (fraction < 1.0) df.sample(withReplacement = false, fraction, seed = 42) else df)
      .select(col(vecCol).cast(ArrayType(FloatType)))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "IVF fit: no vectors to train on")
    val k = math.min(nlist, sample.length)
    if (k >= TwoLevelNlist) hierLloyd(sample, k, iters = 10)
    else lloyd(sample, k, iters = 10)
  }

  /** Two-level Lloyd for large k: cluster the sample into ⌈√k⌉ coarse
    * cells, then Lloyd `k_c` sub-centroids inside each cell with `k_c`
    * allocated proportionally to cell population (largest-remainder,
    * deterministic lowest-id tie-break, capped by population). The
    * returned flat centroid array is the concatenation in (coarse id,
    * sub id) order — fully deterministic, so oracle refit-and-embed
    * still reproduces it. Cost: O(n·√k·d) against flat Lloyd's
    * O(n·k·d); quantization quality gives up a few percent (sub-fits
    * never move points across coarse boundaries), which for an IVF
    * coarse quantizer trades as cell-balance noise, not correctness —
    * assignments remain nearest-of-k at index build and query time. */
  private[search] def hierLloyd(xs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val n = xs.length
    val k1 = math.min(math.ceil(math.sqrt(k.toDouble)).toInt, n)
    val coarse = lloyd(xs, k1, iters)
    // deterministic nearest-coarse assignment (first-min wins, same rule
    // as the Lloyd inner loop)
    val d = xs(0).length
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i).toDouble - b(i); s += t * t; i += 1 }
      s
    }
    val assign = new Array[Int](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < coarse.length) {
        val dd = d2(xs(i), coarse(j))
        if (dd < bestD) { bestD = dd; best = j }
        j += 1
      }
      assign(i) = best
    }
    val counts = new Array[Int](coarse.length)
    var i = 0
    while (i < n) { counts(assign(i)) += 1; i += 1 }
    // proportional sub-centroid allocation: floor share (≥1 for nonempty
    // cells, ≤ population), then hand out the remainder one at a time to
    // the most under-allocated cell (deficit vs exact share; lowest id on
    // ties) — sums exactly to k because Σ caps = n ≥ k
    val alloc = new Array[Int](coarse.length)
    var allocated = 0
    var c = 0
    while (c < coarse.length) {
      if (counts(c) > 0) {
        alloc(c) = math.min(counts(c),
          math.max(1, (k.toLong * counts(c) / n).toInt))
        allocated += alloc(c)
      }
      c += 1
    }
    while (allocated < k) {
      var best = -1; var bestDef = Double.NegativeInfinity
      c = 0
      while (c < coarse.length) {
        if (alloc(c) < counts(c)) {
          val deficit = k.toDouble * counts(c) / n - alloc(c)
          if (deficit > bestDef) { bestDef = deficit; best = c }
        }
        c += 1
      }
      alloc(best) += 1; allocated += 1
    }
    while (allocated > k) { // over-allocation from the max(1, …) floors;
      // a cell with alloc > 1 always exists here: allocated > k ≥ 1024
      // across ≤ ⌈√k⌉ cells forces an average alloc well above 1
      var best = -1; var bestExc = Double.NegativeInfinity
      c = 0
      while (c < coarse.length) {
        if (alloc(c) > 1) {
          val excess = alloc(c) - k.toDouble * counts(c) / n
          if (excess > bestExc) { bestExc = excess; best = c }
        }
        c += 1
      }
      alloc(best) -= 1; allocated -= 1
    }
    // per-cell sub-fit over the cell's points, in sample order
    val members = Array.fill(coarse.length)(new scala.collection.mutable.ArrayBuilder.ofRef[Array[Float]])
    i = 0
    while (i < n) { members(assign(i)) += xs(i); i += 1 }
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[Array[Float]]
    out.sizeHint(k)
    c = 0
    while (c < coarse.length) {
      if (alloc(c) > 0) out ++= lloyd(members(c).result(), alloc(c), iters)
      c += 1
    }
    val cents = out.result()
    assert(cents.length == k, s"hierLloyd produced ${cents.length} of $k centroids")
    cents
  }

  /** Plain Lloyd k-means over a local sample: deterministic spread-out init
    * (greedy farthest-point from a fixed start), 10 iterations, empty
    * clusters re-seeded from the farthest point. */
  private[search] def lloyd(xs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val n = xs.length
    val d = xs(0).length
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i).toDouble - b(i); s += t * t; i += 1 }
      s
    }
    // assignment + partial sums parallelized over FIXED chunks (count not
    // tied to thread scheduling), partials merged in chunk order — so the
    // result is bit-deterministic run to run while the O(n·k·d) inner loops
    // (the whole cost of a driver-side fit) use every core
    val nChunks = math.min(32, n)
    val bounds = Array.tabulate(nChunks + 1)(c => (c.toLong * n / nChunks).toInt)
    // farthest-point init (deterministic k-means++ analog, no RNG). The
    // O(k·n·d) scan is chunk-parallel with the same in-order merge as the
    // Lloyd iterations: per-i minD updates are independent, and the global
    // argmax under strict-> keeps the EARLIEST index among ties whether
    // found in one sequential pass or merged chunk-by-chunk — so the picked
    // centroids are bit-identical to the sequential version (oracle gates
    // embed these centroids; sf10 measured the sequential init dominating
    // the blocked-dedup fit at nlist=3125: ~73 GFLOP on one core)
    val cents = new Array[Array[Float]](k)
    cents(0) = xs(0).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = cents(c - 1)
      val chunkFar = java.util.stream.IntStream.range(0, nChunks).parallel()
        .mapToObj { ch =>
          var far = -1; var farD = -1.0; var i = bounds(ch)
          while (i < bounds(ch + 1)) {
            val dd = d2(xs(i), prev)
            if (dd < minD(i)) minD(i) = dd
            if (minD(i) > farD) { farD = minD(i); far = i }
            i += 1
          }
          (farD, far)
        }
        .toArray(new Array[(Double, Int)](_))
      var far = 0; var farD = -1.0; var ch = 0
      while (ch < nChunks) {
        if (chunkFar(ch)._1 > farD) { farD = chunkFar(ch)._1; far = chunkFar(ch)._2 }
        ch += 1
      }
      cents(c) = xs(far).clone(); c += 1
    }
    var it = 0
    while (it < iters) {
      val partials = java.util.stream.IntStream.range(0, nChunks).parallel()
        .mapToObj { c =>
          val sums = Array.ofDim[Double](k, d)
          val counts = new Array[Int](k)
          var i = bounds(c)
          while (i < bounds(c + 1)) {
            var best = 0; var bestD = Double.MaxValue; var j = 0
            while (j < k) {
              val dd = d2(xs(i), cents(j))
              if (dd < bestD) { bestD = dd; best = j }
              j += 1
            }
            counts(best) += 1
            val x = xs(i); var f = 0
            while (f < d) { sums(best)(f) += x(f); f += 1 }
            i += 1
          }
          (sums, counts)
        }
        .toArray(new Array[(Array[Array[Double]], Array[Int])](_))
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      partials.foreach { case (ps, pc) =>
        var j = 0
        while (j < k) {
          counts(j) += pc(j)
          var f = 0
          while (f < d) { sums(j)(f) += ps(j)(f); f += 1 }
          j += 1
        }
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          val cj = new Array[Float](d); var f = 0
          while (f < d) { cj(f) = (sums(j)(f) / counts(j)).toFloat; f += 1 }
          cents(j) = cj
        }
        j += 1
      }
      it += 1
    }
    cents
  }

  /** Assign each indexed row its cell id (fit-time, stored + co-partitioned). */
  def assignCells(indexed: DataFrame, vecCol: String, cents: Array[Array[Float]],
      partitions: Int): DataFrame =
    indexed
      .withColumn(CID, nearestCentroidsCol(col(vecCol), cents, 1).getItem(0))
      .repartition(math.min(partitions, cents.length), col(CID))

  /** Query-time probe: explode each query into its nprobe nearest cells,
    * equi-join on cell id (only those cells are scanned), then per-query
    * top-k via the bounded-heap aggregate ([[TopKByDistance]]) — O(n log k)
    * with map-side partial aggregation, shuffling k rows per query per
    * partition instead of sorting all nprobe·n/nlist candidates per query
    * (the window `row_number` tail this replaced). A row lives in exactly
    * one cell, so candidate (query, row) pairs are already distinct. */
  def ivfTopK(model: SearcherModel, q: DataFrame, topK: Int,
      nprobe: Int): DataFrame = {
    import SparkSearcher._
    val cents = model.centroids.getOrElse(
      throw new IllegalStateException("IVF search without fitted centroids"))
    ivfTopKOver(model.indexed.select(col(ROW_ID), col(VEC), col(CID)),
      model.searcher.metric, cents, q, topK, nprobe)
  }

  /** Cell-pruned exact scoring over a caller-supplied `(row_id, __vec,
    * __cell)` view — shared by IVFn,Flat (stored floats) and IVFn,SQfp16
    * (floats reconstructed lazily in the scoring projection). */
  def ivfTopKOver(slim: DataFrame, metric: graft.functions.VectorFunctions.Metric,
      cents: Array[Array[Float]], q: DataFrame, topK: Int,
      nprobe: Int): DataFrame = {
    import SparkSearcher._
    // nprobe resolves against the FITTED cell count (auto-sized `IVF0`
    // models parse as nlist=0; the fit may also clamp below the requested
    // nlist; nprobe=0 = auto-scaled, IndexStrategy.resolveNprobe)
    val probes = q.withColumn(CID,
      explode(nearestCentroidsCol(col(QVEC), cents,
        IndexStrategy.resolveNprobe(nprobe, cents.length))))
    val scored = probes.join(slim, CID)
      .withColumn(DIST, metric.dist(col(QVEC), col(VEC)))
    val hits = scored
      .groupBy(col(QID))
      .agg(TopKAggregate.top_k(struct(col(ROW_ID), col(DIST)), topK,
        asc = !metric.higherIsCloser).as("__hits"))
      .select(col(QID), posexplode(col("__hits")).as(Seq("__pos", "__hit")))
      .select(col(QID), col("__hit.row_id").as(ROW_ID),
        col("__hit.dist").as(DIST), (col("__pos") + 1).cast("int").as(RANK))
    hits.join(broadcast(q.select(col(QID), col(SourceItem))), QID)
      .select(col(QID), col(SourceItem), col(ROW_ID), col(DIST), col(RANK))
  }
}
