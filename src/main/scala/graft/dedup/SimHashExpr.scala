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

  @inline private def vote(votes: Array[Int], h1: Long, h2: Long): Unit = {
    var b = 0
    while (b < 31) {
      if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
    while (b < Bits) {
      if (((h2 >>> (b - 31)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  @inline private def fingerprint(votes: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash62(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      vote(votes, PolyHash.hash(s, PolyHash.B1), PolyHash.hash(s, PolyHash.B2))
      i += 1
    }
    fingerprint(votes)
  }

  /** Fingerprint straight from the raw text: lowercase, ASCII-`\s+`
    * tokenize, and BOTH polynomial hashes accumulated in ONE byte scan —
    * no split/filter HOF (interpreted, allocation-heavy), no token array.
    * Bit-identical to `simhash62(filter(split(lower(text), "\\s+"), …))`;
    * non-ASCII input falls back to exactly that formulation. */
  def simhash62Text(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    while (i < n) {
      if (text.getByte(i) < 0) return simhash62NonAscii(text)
      i += 1
    }
    val votes = new Array[Int](Bits)
    var h1 = 0L
    var h2 = 0L
    var inTok = false
    i = 0
    while (i <= n) {
      val b: Int = if (i == n) ' ' else text.getByte(i)
      // Java regex \s = [ \t\n\x0B\f\r]
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (ws) {
        if (inTok) { vote(votes, h1, h2); inTok = false; h1 = 0L; h2 = 0L }
      } else {
        val c: Long = if (b >= 'A' && b <= 'Z') b + 32 else b
        h1 = PolyHash.modP(h1 * PolyHash.B1 + c)
        h2 = PolyHash.modP(h2 * PolyHash.B2 + c)
        inTok = true
      }
      i += 1
    }
    fingerprint(votes)
  }

  private def simhash62NonAscii(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val votes = new Array[Int](Bits)
    text.toLowerCase.toString.split("\\s+").foreach { tok =>
      if (tok.nonEmpty)
        vote(votes, PolyHash.hash(tok, PolyHash.B1), PolyHash.hash(tok, PolyHash.B2))
    }
    fingerprint(votes)
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

/** Codegen'd 62-bit SimHash straight from raw text (tokenizes in-kernel,
  * see [[SimHashKernels.simhash62Text]]). */
case class SimHash62Text(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashKernels.simhash62Text(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHashKernels.simhash62Text($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "simhash62_text"
}
