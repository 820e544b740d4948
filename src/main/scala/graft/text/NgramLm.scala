package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fitted interpolated-bigram LM (see [[NgramLm]]). Top-level class —
 * codegen names it as a plan reference object's Java type. `n` = total
 * kept-unigram mass, `v` = kept vocabulary size; `nv = (n + v)` is the
 * smoothing denominator both the kernel and the oracle embed. Values are
 * boxed longs so absent keys are null-checkable from the hot loop.
 */
final class NgramLmModel(
    val unigrams: java.util.HashMap[UTF8String, java.lang.Long],
    val bigrams: java.util.HashMap[UTF8String, java.lang.Long],
    val n: Long,
    val v: Long) extends Serializable {
  def nv: Double = (n + v).toDouble
  /** Deterministically-ordered (gram, count) rows for oracle embedding. */
  def unigramRows: Seq[(String, Long)] = sortedRows(unigrams)
  def bigramRows: Seq[(String, Long)] = sortedRows(bigrams)
  private def sortedRows(m: java.util.HashMap[UTF8String, java.lang.Long]) = {
    val b = Seq.newBuilder[(String, Long)]
    m.forEach((k, c) => b += ((k.toString, c.longValue())))
    b.result().sortBy(_._1)
  }
}

/**
 * N-gram language-model perplexity scoring — the KenLM-filter step of a
 * web-scale curation pipeline (CCNet: score every document's perplexity
 * under a small LM fitted on trusted text; keep by threshold). The
 * reference engine has no LM scoring; this is a north-star extension
 * completing the classifier trio alongside [[Importance]] (DSIR
 * importance ratios) and [[QualityModel]] (fasttext-shaped hashed
 * linear classifier).
 *
 * The model is an interpolated word-bigram LM:
 * `P(w|v) = λ·c(v,w)/c(v) + (1−λ)·(c(w)+1)/(N+V)` with λ = 0.75,
 * add-one-smoothed unigram backoff (always > 0, so the log is total).
 * The document score is the AVERAGE NEGATIVE LOG-LIKELIHOOD over its
 * bigram positions — deliberately not exponentiated into perplexity:
 * `exp` is the one step whose last-ulp behavior DuckDB does not
 * contractually share with the JVM (see [[QualityModel]]), `ln` parity
 * is gate-evidenced (text_bm25, knn_js_top5), and the NLL is
 * order-isomorphic to perplexity anyway (`ppl = exp(nll)` — threshold
 * on the NLL directly).
 *
 * Fit shape at 100 TB: two classic word-count aggregations (map-side
 * partial combine, one shuffle each — token stream and bigram stream),
 * then a driver collect BOUNDED by `maxUnigrams`/`maxBigrams` (top-K by
 * (count DESC, gram ASC) — a deterministic total order, so refits are
 * bit-identical and the fitted tables embed into the oracle SQL as
 * literals). Kept bigrams are CLOSED over kept unigrams (both endpoint
 * tokens must survive the unigram cap) so the scorer's `c(v,w) > 0 ⇒
 * c(v) known` invariant holds by construction. Scoring is one scan with
 * the two count maps riding as broadcast-sized plan reference objects —
 * zero joins, zero shuffles, inside whole-stage codegen.
 */
object NgramLm {

  val Lambda = 0.75

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Fit on `df(textCol)`: exact unigram/bigram counts, top-K kept under
    * a deterministic (count DESC, gram ASC) order, bigrams closed over
    * the kept vocabulary. */
  def fit(df: DataFrame, textCol: String, maxUnigrams: Int = 65536,
      maxBigrams: Int = 65536): NgramLmModel = {
    val t = df.select(toks(col(textCol)).as("t")).where(col("t").isNotNull)
    val uniKept = t.select(explode(col("t")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxUnigrams)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val kept = uniKept.map(_._1).toSet
    // adjacent pairs; slice needs length ≥ 2 (negative-length slice errors)
    val pairs = when(size(col("t")) >= 2,
      zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val bigKept = t.select(explode(pairs).as("b"))
      .groupBy("b").count()
      .orderBy(col("count").desc, col("b").asc)
      .limit(maxBigrams)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      // closure: both endpoints must be kept unigrams, else the scorer's
      // backoff would divide by an unknown c(v)
      .filter { case (bg, _) =>
        val sp = bg.indexOf(' ')
        kept.contains(bg.substring(0, sp)) && kept.contains(bg.substring(sp + 1))
      }
    val uniMap = new java.util.HashMap[UTF8String, java.lang.Long](uniKept.length * 2)
    uniKept.foreach { case (w, c) =>
      uniMap.put(UTF8String.fromString(w), java.lang.Long.valueOf(c)) }
    val bigMap = new java.util.HashMap[UTF8String, java.lang.Long](bigKept.length * 2)
    bigKept.foreach { case (b, c) =>
      bigMap.put(UTF8String.fromString(b), java.lang.Long.valueOf(c)) }
    new NgramLmModel(uniMap, bigMap, uniKept.map(_._2).sum, uniKept.length.toLong)
  }

  private val Space = UTF8String.fromString(" ")

  /** Kernel over a pre-tokenized array: average negative log-likelihood
    * across bigram positions, `ln` terms accumulated in ascending
    * position order (the oracle's `list(l ORDER BY i)` association).
    * Fewer than 2 tokens → 0.0 (no bigram evidence either way). */
  def nllFromToks(toksArr: ArrayData, model: NgramLmModel): Double = {
    val n = toksArr.numElements()
    if (n < 2) return 0.0
    val uni = model.unigrams
    val big = model.bigrams
    val nv = model.nv
    var acc = 0.0
    var i = 1
    while (i < n) {
      val v = toksArr.getUTF8String(i - 1)
      val w = toksArr.getUTF8String(i)
      val cvw = big.get(UTF8String.concat(v, Space, w))
      val term1 =
        if (cvw == null) 0.0
        else (Lambda * cvw.doubleValue()) / uni.get(v).doubleValue()
      val cw = uni.get(w)
      val cwD = if (cw == null) 0.0 else cw.doubleValue()
      val p = term1 + (1.0 - Lambda) * (cwD + 1.0) / nv
      acc += math.log(p)
      i += 1
    }
    -(acc / (n - 1))
  }

  /** NLL over a token-array column. */
  def nllCol(toksC: Column, model: NgramLmModel): Column =
    column(NgramNll(expression(toksC), model))

  /** Convenience: tokenize (lowercase whitespace split, the BM25
    * convention) then score. */
  def score(text: Column, model: NgramLmModel): Column =
    nllCol(toks(text), model)

  /** The DuckDB SQL reproducing [[nllFromToks]] + the tokenization for
    * table `from`(`idCol`, `textCol`) → `(id, nll)` rows; kept NEXT TO
    * the kernel so the two sides evolve together. The fitted tables
    * embed as VALUES literals (the fit is deterministic, so the oracle's
    * refit via [[fit]] reproduces them bit-for-bit). NULL text
    * null-propagates; token counts 0 and 1 score exactly 0.0. */
  def oracleSql(from: String, idCol: String, textCol: String,
      model: NgramLmModel): String = {
    // an empty fitted table would render as the malformed `VALUES ` —
    // emit a typed 0-row relation instead (empty/whitespace-only corpus)
    def values(rows: Seq[(String, Long)], cols: String): String =
      if (rows.isEmpty) s"SELECT NULL::VARCHAR $cols FROM (SELECT 1) WHERE false"
      else "VALUES " + rows
        .map { case (w, c) => s"('${w.replace("'", "''")}', ${c}::BIGINT)" }
        .mkString(", ")
    // literal size is bounded by the fit itself: maxUnigrams + maxBigrams
    // rows (64k default) is the cap on what can appear here
    val uniLit = values(model.unigramRows, "tok, NULL::BIGINT c")
    val bigLit = values(model.bigramRows, "bg, NULL::BIGINT c")
    val nv = model.nv
    s"""WITH uni(tok, c) AS ($uniLit),
       |big(bg, c) AS ($bigLit),
       |b0 AS (SELECT $idCol id, list_filter(regexp_split_to_array(lower($textCol), '\\s+'), t -> len(t) > 0) toks FROM $from),
       |pos AS (SELECT id, unnest(range(1, len(toks))) i FROM b0),
       |pr AS (SELECT pos.id, pos.i, b0.toks[pos.i] v, b0.toks[pos.i + 1] w FROM pos JOIN b0 ON pos.id = b0.id),
       |lt AS (SELECT pr.id, pr.i, ln(
       |    (CASE WHEN bc.c IS NOT NULL THEN ($Lambda * bc.c::DOUBLE) / uv.c::DOUBLE ELSE 0.0 END)
       |    + ${1.0 - Lambda} * (coalesce(uw.c, 0)::DOUBLE + 1.0) / $nv) l
       |  FROM pr
       |  LEFT JOIN big bc ON bc.bg = pr.v || ' ' || pr.w
       |  LEFT JOIN uni uv ON uv.tok = pr.v
       |  LEFT JOIN uni uw ON uw.tok = pr.w),
       |sm AS (SELECT id, -(list_reduce(list_prepend(0.0::DOUBLE, list(l ORDER BY i)), (a, x) -> a + x)
       |    / count(*)) s FROM lt GROUP BY id)
       |SELECT b0.id $idCol, CASE WHEN b0.toks IS NULL THEN NULL
       |  ELSE CAST(coalesce(sm.s, 0.0) AS FLOAT) END nll
       |FROM b0 LEFT JOIN sm ON b0.id = sm.id ORDER BY b0.id""".stripMargin.replace("\n", " ")
  }
}

/** Codegen'd bigram-LM scorer: array<string> tokens → double avg NLL;
  * the fitted model rides as a plan reference object. */
case class NgramNll(child: Expression, model: NgramLmModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    NgramLm.nllFromToks(v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("model", model, "graft.text.NgramLmModel")
    defineCodeGen(ctx, ev, c => s"graft.text.NgramLm.nllFromToks($c, $mRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ngram_nll"
}
