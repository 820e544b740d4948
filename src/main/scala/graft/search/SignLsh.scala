package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Sign-random-projection LSH for cosine similarity — the second ANN
 * access path next to [[IvfIndex]] (faiss-side analog: the LSH family of
 * `index_factory` strings, /root/reference/backend/faiss_searcher.py:104).
 * `numTables` hash tables of `bitsPerTable` hyperplane sign bits each;
 * vectors colliding in ≥1 table are candidates. Collision probability per
 * bit is `1 − θ/π` (θ = angle), so near pairs collide with high
 * probability while the bucket join stays an equi-join — no all-pairs
 * comparison, the property that matters at 100 TB.
 *
 * Hyperplanes are seeded-Gaussian and deterministic, and the bucket
 * computation is plain `sign(dot)` arithmetic in double precision — so the
 * whole candidate generation is bit-exactly reproducible in DuckDB SQL
 * (plane constants embedded), giving LSH pipelines full oracles.
 */
object SignLsh {

  /** Deterministic Gaussian hyperplanes: `numTables × bits × dim`. */
  def planes(numTables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numTables, bits, dim)(rnd.nextGaussian().toFloat)
  }

  /** Per-table bucket keys of one vector: bit j of table t is
    * `dot(v, plane(t)(j)) > 0`, accumulated ascending in double. */
  def buckets(v: ArrayData, planes: Array[Array[Array[Float]]]): ArrayData = {
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = 0L
      var j = 0
      while (j < table.length) {
        val p = table(j)
        var s = 0.0
        var i = 0
        while (i < p.length) { s += v.getFloat(i).toDouble * p(i).toDouble; i += 1 }
        if (s > 0.0) key |= (1L << j)
        j += 1
      }
      out(t) = Long.box(key)
      t += 1
    }
    new GenericArrayData(out)
  }

  def bucketsCol(v: Column, planes: Array[Array[Array[Float]]]): Column =
    column(LshBucketsExpr(expression(v), planes))

  /** DuckDB expression list mirroring [[buckets]] for a DOUBLE[] column
    * `vExpr`: one bucket expression per table, plane constants embedded
    * (Double.toString round-trips to the same IEEE bits in DuckDB). */
  def bucketsSql(vExpr: String, planes: Array[Array[Array[Float]]]): Seq[String] =
    planes.toSeq.map { table =>
      table.zipWithIndex.map { case (p, j) =>
        val consts = p.map(f => java.lang.Double.toString(f.toDouble)).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product($vExpr, $consts) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }
}

/** Codegen'd LSH bucket keys: array<float> vector → array<long> of
  * per-table keys; the plane tensor rides as a plan reference object. */
case class LshBucketsExpr(child: Expression, planes: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SignLsh.buckets(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.search.SignLsh.buckets($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lsh_buckets"
  // content equality over the plane arrays (see HashedLinearScore)
  override def equals(o: Any): Boolean = o match {
    case that: LshBucketsExpr => child == that.child &&
      java.util.Arrays.deepEquals(planes.asInstanceOf[Array[AnyRef]],
        that.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Objects.hash(getClass, child,
    Int.box(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))
}
