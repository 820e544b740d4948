package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

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
  // content equality over the min/diff arrays (see HashedLinearScore)
  override def equals(o: Any): Boolean = o match {
    case that: SqEncodeExpr => child == that.child && nbits == that.nbits &&
      java.util.Arrays.equals(vmin, that.vmin) &&
      java.util.Arrays.equals(vdiff, that.vdiff)
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Objects.hash(getClass, child,
    Int.box(nbits), Int.box(java.util.Arrays.hashCode(vmin)),
    Int.box(java.util.Arrays.hashCode(vdiff)))
}

/**
 * IEEE-754 binary16 ("half") scalar quantization — the faiss `SQfp16`
 * factory path (/root/reference/backend/faiss_searcher.py:100-107 accepts
 * any index_factory string; `SQfp16` is the standard train-free choice).
 * Unlike SQ8/SQ4 there is NOTHING to fit: each dimension rounds
 * independently to the nearest representable half (round-to-nearest-even,
 * the IEEE default) — 2 bytes per dim, a fixed 2× compression with ≤2⁻¹¹
 * relative error, the "free" first notch before bounds-trained
 * quantizers. Because codes are 16-bit, the byte-indexed ADC-table
 * machinery does not apply; search instead DECODES inside the scoring
 * projection — a codegen expression fused into the same
 * whole-stage-codegen scan as the distance kernel, so the 2-byte codes
 * are what is cached/persisted/shuffled and float vectors only ever
 * exist per-row in flight — and reuses the exact top-k tails.
 *
 * The half↔float conversions are self-contained bit manipulation (the
 * JDK's `Float.floatToFloat16` arrived in Java 20; this builds on 17)
 * and fully deterministic, so fp16 search results are exactly
 * reproducible across JVMs.
 */
object Fp16 {

  /** float32 → half bits, round-to-nearest-even. Overflow → ±Inf,
    * NaN → quiet NaN (payload top bit set), subnormal halves exact,
    * |x| < 2⁻²⁵ (and ties at 2⁻²⁵) → signed zero. */
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) { // Inf / NaN: keep the distinction, quieten the NaN
      (sign | 0x7c00 | (if (m != 0) 0x200 | (m >>> 13) else 0)).toShort
    } else {
      val he = e - 112 // half biased exponent: e − 127 + 15
      if (he >= 0x1f) (sign | 0x7c00).toShort // overflow → Inf
      else if (he > 0) { // normal half: 23-bit mantissa → 10, RNE
        val mant = m >>> 13
        val rem = m & 0x1fff
        var h = sign | (he << 10) | mant
        // a mantissa carry rolls into the exponent (and, at the top,
        // into Inf) — exactly the IEEE rounding behavior
        if (rem > 0x1000 || (rem == 0x1000 && (mant & 1) == 1)) h += 1
        h.toShort
      } else { // subnormal half (or underflow to zero)
        // 24-bit significand; value = full · 2^(e−150); half subnormal
        // unit is 2⁻²⁴, so the target mantissa = full >> (126 − e), RNE
        val shift = 126 - e
        if (shift > 24) sign.toShort // < 2⁻²⁵: below half of the smallest
        else {
          val full = m | 0x800000
          val mant = full >>> shift
          val half = 1 << (shift - 1)
          val rem = full & ((1 << shift) - 1)
          var h = sign | mant
          if (rem > half || (rem == half && (mant & 1) == 1)) h += 1
          h.toShort
        }
      }
    }
  }

  /** half bits → float32 (exact — every half is representable). */
  def fromHalf(h: Short): Float = {
    val bits = h & 0xffff
    val neg = (bits & 0x8000) != 0
    val e = (bits >>> 10) & 0x1f
    val m = bits & 0x3ff
    val mag =
      if (e == 0x1f) {
        if (m == 0) Float.PositiveInfinity
        else java.lang.Float.intBitsToFloat(0x7f800000 | (m << 13))
      }
      // subnormal: m · 2⁻²⁴; normal: (1024 + m) · 2^(e−25) — both exact
      else if (e == 0) Math.scalb(m.toFloat, -24)
      else Math.scalb((m | 0x400).toFloat, e - 25)
    if (neg) -mag else mag
  }

  /** Encode kernel: 2 bytes per dim, little-endian half bits. */
  def encode(v: ArrayData): Array[Byte] = {
    val d = v.numElements()
    val out = new Array[Byte](2 * d)
    var i = 0
    while (i < d) {
      val h = toHalf(v.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode kernel: the reconstruction the codes denote, as a primitive
    * float array (no per-element boxing on the scoring path). */
  def decode(b: Array[Byte]): ArrayData = {
    val d = b.length / 2
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      out(i) = fromHalf((((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff)).toShort)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def encodeCol(v: Column): Column = column(Fp16EncodeExpr(expression(v)))
  def decodeCol(codes: Column): Column = column(Fp16DecodeExpr(expression(codes)))
}

/** Codegen'd fp16 encoder: array<float> → binary(2·dim). */
case class Fp16EncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = Fp16.encode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.search.Fp16.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "fp16_encode"
}

/** Codegen'd fp16 decoder: binary(2·dim) → array<float>; fuses into the
  * same whole-stage-codegen span as the distance kernel downstream. */
case class Fp16DecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any = Fp16.decode(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.search.Fp16.decode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "fp16_decode"
}
