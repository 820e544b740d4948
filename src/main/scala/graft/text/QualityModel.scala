package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PolyHash

/**
 * Model-based quality scoring — the fasttext-shaped classifier filter
 * step of a web-scale curation pipeline (CCNet-style: score every
 * document with a cheap linear model over hashed n-gram features, keep
 * by threshold). The reference engine has no model scoring; this is a
 * north-star extension alongside the heuristic `qualityScore`
 * ([[TextAnalysis]]) — heuristics prune garbage, a trained linear model
 * ranks the remainder.
 *
 * Feature map (fasttext's hashing trick): unigram and adjacent-bigram
 * tokens hash into `weights.length` buckets via the oracle-expressible
 * polynomial fold ([[graft.functions.PolyHash]]); the document vector is
 * the bucket-count distribution normalized by total feature count. Score
 * = `bias + Σ_b w_b · c_b / total` — the LOGIT, deliberately not pushed
 * through a sigmoid: `exp` is the one step whose last-ulp behavior
 * DuckDB does not contractually share with the JVM, and the logit is
 * order-isomorphic to the probability anyway (threshold on it directly).
 * Summation runs over OCCUPIED buckets in ascending bucket order, bias
 * seeded first — bit-reproducible in SQL, so the gate hash-matches.
 *
 * Training is out of scope by design (the reference ships no trainer
 * either): weights arrive from the caller — a fasttext/logreg model
 * hashed into the same bucket space — or [[demoWeights]] for a
 * deterministic fixture. One scan, zero shuffles, zero joins: the
 * entire scorer is a per-row codegen kernel.
 */
object QualityModel {

  /** Deterministic fixture weights in [−0.5, 0.5): Knuth-hash of the
    * bucket id — stable across JVMs, embeddable as SQL literals. */
  def demoWeights(buckets: Int): Array[Float] =
    Array.tabulate(buckets) { b =>
      ((((b.toLong * 2654435761L) % 1000L + 1000L) % 1000L) / 1000.0 - 0.5).toFloat
    }

  private val Space = UTF8String.fromString(" ")

  /** Kernel over a pre-tokenized array (tokenization stays in the proven
    * `filter(split(lower(text)))` Column form shared with BM25): hashed
    * unigram + bigram bucket counts, normalized dot with the weights. */
  /** Bucket spaces up to this size count into a dense array (cheap to
    * allocate and scan); above it, per-row cost would be O(buckets)
    * regardless of document length, so an open-addressed map over the
    * occupied buckets is used instead. */
  private val DenseBucketLimit = 8192

  def logitFromToks(toks: ArrayData, w: Array[Float], bias: Double): Double = {
    val n = toks.numElements()
    val buckets = w.length
    if (n == 0) return bias
    if (buckets <= DenseBucketLimit) logitDense(toks, n, w, bias)
    else logitSparse(toks, n, w, bias)
  }

  private def logitDense(toks: ArrayData, n: Int, w: Array[Float],
      bias: Double): Double = {
    val buckets = w.length
    val counts = new Array[Int](buckets)
    var total = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      counts((PolyHash.hash(t, PolyHash.B1) % buckets).toInt) += 1
      total += 1
      if (i + 1 < n) {
        val bg = UTF8String.concat(t, Space, toks.getUTF8String(i + 1))
        counts((PolyHash.hash(bg, PolyHash.B1) % buckets).toInt) += 1
        total += 1
      }
      i += 1
    }
    // ascending-bucket sum over OCCUPIED buckets only, bias seeded first —
    // exactly the oracle's list_reduce(list_prepend(bias, list(t ORDER BY
    // bucket))) association (skipping zero-count buckets mirrors the SQL
    // side, whose GROUP BY only materializes occupied buckets)
    var z = bias
    var b = 0
    while (b < buckets) {
      val c = counts(b)
      if (c > 0) z += w(b) * (c.toDouble / total)
      b += 1
    }
    z
  }

  /** Large bucket spaces: at most 2n−1 features exist per document, so an
    * open-addressed (bucket → count) map sized to the document bounds the
    * per-row cost by tokens, not buckets. The occupied buckets are then
    * sorted ascending before the sum — the SAME association as the dense
    * path and the SQL oracle, so results are bit-identical. */
  private def logitSparse(toks: ArrayData, n: Int, w: Array[Float],
      bias: Double): Double = {
    val buckets = w.length
    val maxFeats = 2 * n
    val cap = Integer.highestOneBit(math.max(8, maxFeats * 2) - 1) << 1
    val keys = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    var occupied = 0
    def bump(bucket: Int): Unit = {
      var s = bucket & mask
      while (keys(s) != -1 && keys(s) != bucket) s = (s + 1) & mask
      if (keys(s) == -1) { keys(s) = bucket; occupied += 1 }
      cnts(s) += 1
    }
    var total = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      bump((PolyHash.hash(t, PolyHash.B1) % buckets).toInt)
      total += 1
      if (i + 1 < n) {
        val bg = UTF8String.concat(t, Space, toks.getUTF8String(i + 1))
        bump((PolyHash.hash(bg, PolyHash.B1) % buckets).toInt)
        total += 1
      }
      i += 1
    }
    val occ = new Array[Int](occupied)
    var s = 0
    var o = 0
    while (s < cap) {
      if (keys(s) != -1) { occ(o) = s; o += 1 }
      s += 1
    }
    // sort slot indices by bucket id — occupied count is ≤ 2n, tiny
    val byBucket = occ.map(si => (keys(si), cnts(si))).sortBy(_._1)
    var z = bias
    var j = 0
    while (j < byBucket.length) {
      val (b, c) = byBucket(j)
      z += w(b) * (c.toDouble / total)
      j += 1
    }
    z
  }

  /** `logit` over a token-array column. */
  def logitCol(toks: Column, weights: Array[Float], bias: Double): Column =
    column(HashedLinearScore(expression(toks), weights, bias))

  /** Convenience: tokenize (lowercase whitespace split, the BM25
    * convention) then score. */
  def score(text: Column, weights: Array[Float], bias: Double): Column =
    logitCol(filter(split(lower(text), "\\s+"), t => length(t) > 0),
      weights, bias)

  /** The DuckDB SQL reproducing [[logitFromToks]] + the tokenization for
    * table `from`(`idCol`, `textCol`) → `(id, score)` rows; used by the
    * gate's oracle and kept NEXT TO the kernel so the two sides evolve
    * together. NULL text null-propagates on both sides (the Spark kernel
    * is a null-safe UnaryExpression; the SQL's outer CASE mirrors it —
    * a token-FREE but non-null text still scores the bare bias). */
  def oracleSql(from: String, idCol: String, textCol: String,
      weights: Array[Float], bias: Double): String = {
    val buckets = weights.length
    val wLit = weights.map(_.toDouble).mkString("[", ", ", "]")
    s"""WITH wt(w) AS (VALUES ($wLit)),
       |b0 AS (SELECT $idCol id, list_filter(regexp_split_to_array(lower($textCol), '\\s+'), t -> len(t) > 0) toks FROM $from),
       |uni AS (SELECT id, unnest(toks) tok FROM b0),
       |big AS (SELECT id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) tok FROM b0),
       |feats AS (SELECT id, ${PolyHash.sql("tok", PolyHash.B1)} % $buckets bkt FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
       |cnts AS (SELECT id, bkt, count(*) c FROM feats GROUP BY 1, 2),
       |tot AS (SELECT id, CAST(sum(c) AS BIGINT) total FROM cnts GROUP BY 1),
       |terms AS (SELECT cnts.id, cnts.bkt, wt.w[cnts.bkt + 1] * (cnts.c::DOUBLE / tot.total) t
       |  FROM cnts JOIN tot ON cnts.id = tot.id CROSS JOIN wt),
       |sc AS (SELECT id, list_reduce(list_prepend($bias::DOUBLE, list(t ORDER BY bkt)), (a, x) -> a + x) z
       |  FROM terms GROUP BY id)
       |SELECT b0.id $idCol, CASE WHEN b0.toks IS NULL THEN NULL
       |  ELSE CAST(coalesce(sc.z, $bias::DOUBLE) AS FLOAT) END score
       |FROM b0 LEFT JOIN sc ON b0.id = sc.id ORDER BY b0.id""".stripMargin.replace("\n", " ")
  }
}

/** Codegen'd hashed-linear scorer: array<string> tokens → double logit;
  * weights ride as a plan reference object. */
case class HashedLinearScore(child: Expression, weights: Array[Float], bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "hashed linear score needs at least one bucket")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    QualityModel.logitFromToks(v.asInstanceOf[ArrayData], weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.text.QualityModel.logitFromToks($c, $wRef, $bias)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hashed_linear_score"
  // Array fields degrade case-class equality to reference identity —
  // compare weight CONTENT so semantically equal expressions
  // canonicalize equal (CSE / plan-cache matching)
  override def equals(o: Any): Boolean = o match {
    case that: HashedLinearScore => child == that.child && bias == that.bias &&
      java.util.Arrays.equals(weights, that.weights)
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Objects.hash(getClass, child,
    Double.box(bias), Int.box(java.util.Arrays.hashCode(weights)))
}
