package graft.dedup

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

import graft.functions.PolyHash

/** Single-pass SimHash kernel over a token array. 62-bit fingerprint from
  * two independent 31-bit polynomial hashes per token ([[PolyHash]] with
  * multipliers B1/B2) — bits 0..30 from h1, bits 31..61 from h2. The
  * polynomial hash (vs xxhash64) makes the whole fingerprint expressible
  * as DuckDB SQL, so simhash near-dup output gets an exact oracle; 62
  * well-mixed bits lose nothing material vs 64 for near-dup banding. Each
  * bit votes ±1 per token occurrence (multiset semantics); vote signs form
  * the fingerprint. */
object SimHashKernels {
  val Bits = 62

  def simhash62(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h1 = PolyHash.hash(s, PolyHash.B1)
      val h2 = PolyHash.hash(s, PolyHash.B2)
      var b = 0
      while (b < 31) {
        if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      while (b < Bits) {
        if (((h2 >>> (b - 31)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Codegen'd 62-bit SimHash of an array<string> of tokens. */
case class SimHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashKernels.simhash62(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHashKernels.simhash62($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "simhash62"
}
