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

  /** Per-dim quantization code at `nbits`: `clamp(⌊(v − vmin)/vdiff ·
    * (2^nbits − 1) + 0.5⌋, 0, 2^nbits − 1)`; a constant dimension
    * (vdiff = 0) encodes 0. Out-of-range values (rows `add()`ed after
    * fit, outside the trained bounds) clamp to the edge levels — faiss
    * SQ does the same. */
  @inline private def codeOf(x: Double, mn: Double, dv: Double, maxCode: Double): Int =
    if (dv == 0.0) 0
    else {
      val t = math.floor((x - mn) / dv * maxCode + 0.5)
      if (t < 0.0) 0 else if (t > maxCode) maxCode.toInt else t.toInt
    }

  /** SQ8 encode kernel: one byte per dimension. */
  def encode(v: ArrayData, vmin: Array[Float], vdiff: Array[Float]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      out(i) = codeOf(v.getFloat(i).toDouble, vmin(i).toDouble, vdiff(i).toDouble, 255.0).toByte
      i += 1
    }
    out
  }

  /** SQ4 encode kernel: TWO dims nibble-packed per byte (hi nibble =
    * even dim, lo nibble = odd dim; an odd trailing dim packs alone in
    * the hi nibble) — ⌈dim/2⌉ bytes per vector, 8× under float32. */
  def encode4(v: ArrayData, vmin: Array[Float], vdiff: Array[Float]): Array[Byte] = {
    val d = vmin.length
    val out = new Array[Byte]((d + 1) / 2)
    var s = 0
    while (s < out.length) {
      val i = 2 * s
      val hi = codeOf(v.getFloat(i).toDouble, vmin(i).toDouble, vdiff(i).toDouble, 15.0)
      val lo = if (i + 1 < d)
        codeOf(v.getFloat(i + 1).toDouble, vmin(i + 1).toDouble, vdiff(i + 1).toDouble, 15.0)
      else 0
      out(s) = ((hi << 4) | lo).toByte
      s += 1
    }
    out
  }

  def encodeCol(v: Column, vmin: Array[Float], vdiff: Array[Float],
      nbits: Int = 8): Column =
    column(SqEncodeExpr(expression(v), vmin, vdiff, nbits))

  /** The synthetic PQ view of the quantizer — exactly what
    * [[PqIndex.adcScorer]] needs to serve every reference metric over SQ
    * codes. SQ8: dim subspaces of size 1, 256 levels each. SQ4: ⌈dim/2⌉
    * subspaces of size 2 (size 1 for an odd trailing dim), the 256
    * entries of subspace s decoding byte value b as
    * `(level(2s, b>>4), level(2s+1, b&15))`. Levels are float-rounded
    * (that IS the reconstruction the codes denote). */
  def levels(vmin: Array[Float], vdiff: Array[Float], nbits: Int = 8): Array[Array[Array[Float]]] = {
    def lvl(i: Int, c: Int, maxCode: Double): Float =
      (vmin(i).toDouble + c.toDouble / maxCode * vdiff(i).toDouble).toFloat
    nbits match {
      case 8 =>
        Array.tabulate(vmin.length) { i =>
          Array.tabulate(256)(c => Array(lvl(i, c, 255.0)))
        }
      case 4 =>
        val d = vmin.length
        Array.tabulate((d + 1) / 2) { s =>
          val i = 2 * s
          Array.tabulate(256) { b =>
            if (i + 1 < d) Array(lvl(i, b >>> 4, 15.0), lvl(i + 1, b & 15, 15.0))
            else Array(lvl(i, b >>> 4, 15.0))
          }
        }
      case other => throw new IllegalArgumentException(s"SQ nbits must be 8 or 4, got $other")
    }
  }
}

/** Codegen'd SQ encoder: array<float> → binary(⌈dim·nbits/8⌉); bounds
  * ride as plan reference objects. */
case class SqEncodeExpr(child: Expression, vmin: Array[Float], vdiff: Array[Float],
    nbits: Int = 8) extends UnaryExpression {
  require(nbits == 8 || nbits == 4, s"SQ nbits must be 8 or 4, got $nbits")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    if (nbits == 4) SqIndex.encode4(v.asInstanceOf[ArrayData], vmin, vdiff)
    else SqIndex.encode(v.asInstanceOf[ArrayData], vmin, vdiff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("vmin", vmin, "float[]")
    val dfRef = ctx.addReferenceObj("vdiff", vdiff, "float[]")
    val fn = if (nbits == 4) "encode4" else "encode"
    defineCodeGen(ctx, ev, c => s"graft.search.SqIndex.$fn($c, $mnRef, $dfRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sq_encode"
}
