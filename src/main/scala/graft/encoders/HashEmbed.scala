package graft.encoders

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PolyHash

/**
 * Single-pass feature-hashing kernel: lowercase, split on non-word runs,
 * hash each token into one of `dim` buckets (polynomial hash B1) with a
 * sign from an independent hash (B2), accumulate, L2-normalize. One
 * codegen'd expression — the earlier higher-order-function formulation was
 * interpreted per token × per bucket (O(T·dim) boxed lambda calls); this
 * is O(T + dim) in generated code. The polynomial hashes make the whole
 * embedding bit-exactly expressible in DuckDB SQL, so encoder-path search
 * queries get full hash-match oracles.
 */
object HashEmbedKernel {
  def embed(text: UTF8String, dim: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Float](dim)
    val toks = s.split("\\W+")
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val bucket = (PolyHash.hash(tok, PolyHash.B1) % dim).toInt
        val sign = if (PolyHash.hash(tok, PolyHash.B2) % 2 == 0) 1f else -1f
        counts(bucket) += sign
      }
      t += 1
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { val x = counts(i).toDouble; ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    if (norm != 0.0) {
      i = 0
      while (i < dim) { counts(i) = (counts(i).toDouble / norm).toFloat; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** DuckDB expression computing [[embed]]'s raw (un-normalized) integer
    * bucket vector of `textExpr`. The oracle builder normalizes it in CTE
    * stages: `nrm = sqrt(list_sum(list_transform(v0, x -> (x*x)::DOUBLE)))`
    * then `((x::DOUBLE / nrm)::FLOAT)::DOUBLE` per component (float-rounded
    * exactly like the kernel, widened for the double-precision distance
    * oracle; zero vectors pass through float-rounded unchanged). */
  def sqlRawVec(textExpr: String, dim: Int): String = {
    val toks = s"list_filter(regexp_split_to_array(lower($textExpr), '\\W+'), t -> len(t) > 0)"
    val contribs = s"list_transform($toks, t -> {" +
      s"'b': ${PolyHash.sql("t", PolyHash.B1)} % $dim, " +
      s"'g': CASE WHEN ${PolyHash.sql("t", PolyHash.B2)} % 2 = 0 THEN 1 ELSE -1 END})"
    s"list_transform(range(0, $dim), i -> " +
      s"coalesce(list_sum(list_transform($contribs, x -> CASE WHEN x.b = i THEN x.g ELSE 0 END)), 0))"
  }

  /** CTE suffix normalizing a raw vector column `v0` (from [[sqlRawVec]])
    * into `v: DOUBLE[]`, float-rounded like the kernel. Interpolate as
    * `WITH base AS (...), ${normCtes("base")} SELECT ... FROM fv`. */
  def normCtes(baseRel: String): String =
    s"nv AS (SELECT *, sqrt(list_sum(list_transform(v0, x -> (x * x)::DOUBLE))) nrm FROM $baseRel), " +
      "fv AS (SELECT *, CASE WHEN nrm = 0 THEN list_transform(v0, x -> (x::FLOAT)::DOUBLE) " +
      "ELSE list_transform(v0, x -> ((x::DOUBLE / nrm)::FLOAT)::DOUBLE) END v FROM nv)"
}

/** Codegen'd hashing-trick text embedding: string → array<float> of `dim`. */
case class HashEmbedExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashEmbedKernel.embed(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.encoders.HashEmbedKernel.embed($c, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hash_embed"
}
