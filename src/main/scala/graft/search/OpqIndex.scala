package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/**
 * OPQ pre-rotation for product quantization — the faiss `OPQm,PQm` factory
 * path (faiss_searcher.py:104 accepts any factory string; OPQ is the
 * standard pretransform). PQ quantizes each subspace independently, so its
 * error is smallest when variance is spread evenly and correlations don't
 * straddle subspace boundaries; a fitted orthonormal rotation applied
 * before encoding typically halves quantization error at the same code
 * size (Ge et al. 2013, "Optimized Product Quantization").
 *
 * This is the PARAMETRIC variant (OPQ-P, §4 of the paper): rotate into the
 * eigenbasis of the data's second-moment matrix, then allocate eigen-
 * directions to the `m` subspaces balancing their variance products —
 * closed-form, no alternating iterations, fully deterministic. Moments are
 * a `treeAggregate` (one pass, d² doubles per partition — the whitening
 * fit's shape); the d×d eigendecomposition runs driver-side via Breeze,
 * exactly like [[graft.whitening.VecsWhitening]]'s SVD.
 *
 * The rotation is NOT centered: an orthonormal rotation alone preserves
 * dot products and l2 distances (⟨Rx, Rq⟩ = ⟨x, q⟩), so cos/ip/l2
 * searches in rotated space are exactly the original-space searches —
 * centering would break ip. Metrics that are not rotation-invariant
 * (l1, l∞, …) reject at fit.
 */
object OpqIndex {

  /** Rotation kernel: y = R·x, each row accumulated in double over
    * ascending element order, rounded to float (the stored/queried
    * representation — same discipline as the whitening transform). */
  def rotate(v: ArrayData, rows: Array[Array[Float]]): ArrayData = {
    val d = rows.length
    val out = new Array[Float](d)
    var j = 0
    while (j < d) {
      val r = rows(j)
      var acc = 0.0
      var i = 0
      while (i < r.length) { acc += r(i).toDouble * v.getFloat(i).toDouble; i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def rotateCol(v: Column, rows: Array[Array[Float]]): Column =
    column(OpqRotateExpr(expression(v), rows))

  /**
   * Fit the OPQ-P rotation: second-moment eigenbasis with eigenvalue-
   * balanced subspace allocation. Returns the d×d rotation as float ROWS
   * (row j = the eigen-direction written to output dimension j); rows
   * `b·dsub … (b+1)·dsub−1` are the directions allocated to subspace `b`.
   */
  def fitRotation(df: DataFrame, vecCol: String, dim: Int, m: Int): Array[Array[Float]] = {
    require(dim % m == 0, s"OPQ: dim $dim must divide into m=$m subspaces")
    // one-pass uncentered second-moment matrix: Σ x·xᵀ (upper triangle
    // accumulated, mirrored after — halves the inner-loop work)
    val moments = df.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0).toArray)
      .treeAggregate(new Array[Double](dim * dim))(
        (a, v) => {
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            var j = i
            while (j < dim) { a(i * dim + j) += vi * v(j); j += 1 }
            i += 1
          }
          a
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    val mat = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) =>
      if (i <= j) moments(i * dim + j) else moments(j * dim + i))
    val es = breeze.linalg.eigSym(mat)
    // deterministic sign convention: largest-|component| entry positive
    val eig: Array[(Double, Array[Double])] = Array.tabulate(dim) { c =>
      val vec = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      var mi = 0
      var i = 1
      while (i < dim) { if (math.abs(vec(i)) > math.abs(vec(mi))) mi = i; i += 1 }
      if (vec(mi) < 0) { var k = 0; while (k < dim) { vec(k) = -vec(k); k += 1 } }
      (es.eigenvalues(c), vec)
    }
    // allocate eigen-directions (variance descending) to the m subspaces,
    // greedily evening out each subspace's log-variance product
    val ordered = eig.zipWithIndex.sortBy { case ((l, _), idx) => (-l, idx) }
    val buckets = allocate(ordered.map(_._1._1), m)
    val byBucket = buckets.map(_.map(i => ordered(i)._1._2))
    byBucket.flatten.map(_.map(_.toFloat))
  }

  /**
   * Balanced-product allocation: assign `eigenvalues` (MUST be sorted
   * descending; indices into that order are returned, `m` buckets of equal
   * size) so the per-bucket log-variance products even out — each value
   * goes to the non-full bucket with the smallest running sum, ties to the
   * lowest bucket index.
   *
   * The sums compare SHIFTED logs, `log λ − log λ_min + ε`: raw `log λ`
   * goes negative for λ < 1 (an unnormalized second-moment spectrum does
   * this whenever n ≲ d), and a negative contribution makes the bucket
   * holding the LARGEST eigenvalue compare below an empty bucket — the
   * greedy then block-fills bucket 0 with the entire spectrum head, the
   * maximally UNbalanced outcome. Shifting every log non-negative (ε keeps
   * non-empty buckets strictly above empty ones) restores the intended
   * round-robin-like spread; a constant shift per item changes no relative
   * ordering between equal-fill buckets, so balance is preserved exactly.
   */
  private[search] def allocate(eigenvalues: Array[Double], m: Int): Array[Array[Int]] = {
    val dsub = eigenvalues.length / m
    val minLog = eigenvalues.map(l => math.log(math.max(l, 1e-12))).min
    val bucketSum = new Array[Double](m)
    val bucketFill = new Array[Int](m)
    val assign = Array.fill(m)(Array.newBuilder[Int])
    eigenvalues.indices.foreach { i =>
      var best = -1
      var b = 0
      while (b < m) {
        if (bucketFill(b) < dsub && (best < 0 || bucketSum(b) < bucketSum(best)))
          best = b
        b += 1
      }
      assign(best) += i
      bucketSum(best) += math.log(math.max(eigenvalues(i), 1e-12)) - minLog + 1e-9
      bucketFill(best) += 1
    }
    assign.map(_.result())
  }
}

/** Codegen'd rotation: array<float> → array<float>; the fitted rows ride
  * as a plan reference object (same shape as [[PqEncodeExpr]]). */
case class OpqRotateExpr(child: Expression, rows: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    OpqIndex.rotate(v.asInstanceOf[ArrayData], rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("opqRows", rows, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.search.OpqIndex.rotate($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "opq_rotate"
  // content equality over the rotation rows (see HashedLinearScore)
  override def equals(o: Any): Boolean = o match {
    case that: OpqRotateExpr => child == that.child &&
      java.util.Arrays.deepEquals(rows.asInstanceOf[Array[AnyRef]],
        that.rows.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Objects.hash(getClass, child,
    Int.box(java.util.Arrays.deepHashCode(rows.asInstanceOf[Array[AnyRef]])))
}
