package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * Scalar quantization — the faiss `SQ8` factory path
 * (/root/reference/backend/faiss_searcher.py:100-107 accepts any
 * index_factory string; `SQ8` and `IVFn,SQ8` are standard choices). Each
 * dimension is quantized independently to one byte against per-dimension
 * `[min, max]` bounds learned from the corpus: dim bytes per vector
 * instead of dim floats — a fixed 4× compression with far better
 * reconstruction than PQ at the same code size (no cross-dimension
 * codebook sharing), the usual first step before PQ when memory is only
 * moderately tight.
 *
 * Key structural fact this implementation leans on: **SQ8 is product
 * quantization with m = dim subspaces of size 1**, whose per-subspace
 * "codebook" is the 256 uniform dequantization levels
 * `level(i, c) = float(vmin_i + c/255 · (vmax_i − vmin_i))`. Search
 * therefore reuses [[PqIndex]]'s ADC scorer, bounded-heap top-k and the
 * `IVFn,…` cell-pruned composition verbatim — only fit (an exact
 * per-dimension min/max aggregation instead of Lloyd) and encode (an
 * analytic round instead of a 256-way nearest-centroid scan) are new.
 *
 * Deterministic end to end: min/max is exactly associative (no
 * float-order sensitivity, unlike a sum), encode is a closed-form
 * expression of the bounds, and the levels are closed-form from the
 * bounds — so the whole path is hash-match oracle-checkable.
 */
object SqIndex {

  /** Per-dimension `(vmin, vdiff = vmax − vmin)` over the corpus, via one
    * treeAggregate of elementwise min/max arrays — O(dim) state, map-side
    * combined, no shuffle of vector data; exact regardless of partition
    * order. */
  def fitBounds(df: DataFrame, vecCol: String, dim: Int): (Array[Float], Array[Float]) = {
    require(dim > 0, "SQ fit on empty/zero-dim vectors")
    val zero = (Array.fill(dim)(Float.MaxValue), Array.fill(dim)(Float.MinValue))
    val (mins, maxs) = df.select(col(vecCol)).rdd
      .treeAggregate(zero)(
        seqOp = { case ((mn, mx), row) =>
          val v = row.getSeq[Float](0)
          var i = 0
          while (i < dim) {
            val x = v(i)
            if (x < mn(i)) mn(i) = x
            if (x > mx(i)) mx(i) = x
            i += 1
          }
          (mn, mx)
        },
        combOp = { case ((mn1, mx1), (mn2, mx2)) =>
          var i = 0
          while (i < dim) {
            if (mn2(i) < mn1(i)) mn1(i) = mn2(i)
            if (mx2(i) > mx1(i)) mx1(i) = mx2(i)
            i += 1
          }
          (mn1, mx1)
        })
    val vdiff = Array.tabulate(dim)(i => maxs(i) - mins(i))
    (mins, vdiff)
  }

  /** Encode kernel: `code_i = clamp(⌊(v_i − vmin_i)/vdiff_i · 255 + 0.5⌋,
    * 0, 255)`, one byte per dimension; a constant dimension (vdiff = 0)
    * encodes 0. Out-of-range values (rows `add()`ed after fit, outside the
    * trained bounds) clamp to the edge levels — faiss SQ does the same. */
  def encode(v: ArrayData, vmin: Array[Float], vdiff: Array[Float]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val dv = vdiff(i).toDouble
      val c =
        if (dv == 0.0) 0
        else {
          val t = math.floor((v.getFloat(i).toDouble - vmin(i).toDouble) / dv * 255.0 + 0.5)
          if (t < 0.0) 0 else if (t > 255.0) 255 else t.toInt
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  def encodeCol(v: Column, vmin: Array[Float], vdiff: Array[Float]): Column =
    column(SqEncodeExpr(expression(v), vmin, vdiff))

  /** The synthetic PQ view of the quantizer: dim "subspaces" of size 1,
    * 256 float levels each — exactly what [[PqIndex.adcScorer]] needs to
    * serve every reference metric over SQ codes. Levels are float-rounded
    * (that IS the reconstruction the codes denote). */
  def levels(vmin: Array[Float], vdiff: Array[Float]): Array[Array[Array[Float]]] =
    Array.tabulate(vmin.length) { i =>
      Array.tabulate(256) { c =>
        Array((vmin(i).toDouble + c.toDouble / 255.0 * vdiff(i).toDouble).toFloat)
      }
    }
}

/** Codegen'd SQ encoder: array<float> → binary(dim); bounds ride as plan
  * reference objects. */
case class SqEncodeExpr(child: Expression, vmin: Array[Float], vdiff: Array[Float])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    SqIndex.encode(v.asInstanceOf[ArrayData], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("vmin", vmin, "float[]")
    val dfRef = ctx.addReferenceObj("vdiff", vdiff, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.search.SqIndex.encode($c, $mnRef, $dfRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sq_encode"
}
