package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lexical relevance scoring — the keyword-search complement to the
 * engine's vector search (a curation pipeline filters/ranks by BOTH:
 * embedding similarity for semantics, BM25 for exact-term relevance).
 *
 * BM25 (Robertson/Sparck-Jones, the standard probabilistic ranking
 * function): for query terms Q and document D,
 * `score = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))`
 * with `idf(t) = ln((N − n_t + 0.5)/(n_t + 0.5) + 1)`.
 *
 * Execution shape: ONE tokenize pass (doc lengths + per-term counts
 * together), corpus stats as a broadcast 1-row aggregate, per-term
 * document frequencies as a broadcast |Q|-row aggregate — the only
 * full-table shuffle is the per-(doc, term) count, keyed by doc id. Every
 * input to the float math is an integer (tf, n_t, dl, N), so the double
 * expression tree is bit-reproducible in SQL: per-term scores are summed
 * in FIXED term order (pivoted columns, not an unordered aggregate),
 * keeping the result hash-match oracle-checkable.
 */
object Relevance {

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** `[<idCol>, score]` for every document containing ≥1 query term. */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms0: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = terms0.distinct // a duplicate term must not double its score
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(!terms.contains(idCol),
      s"query term '$idCol' collides with the id column (pivot names columns by term)")
    val tokenized = df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    // corpus stats: one broadcast row (N, avgdl)
    val stats = tokenized.agg(
      count(lit(1)).as("__n_docs"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    // term frequencies per (doc, term), query terms only — filter INSIDE
    // the array before exploding, so only query-term occurrences ever
    // become rows (the full-token explode was the pipeline's widest point)
    val termSet = terms.toSet
    val tf = tokenized
      .select(col(idCol), col("__dl"),
        explode(filter(col("__toks"), t => t.isInCollection(termSet))).as("__t"))
      .groupBy(col(idCol), col("__dl"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    // document frequency per term: broadcast |terms| rows
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__nt"))
    val scored = tf
      .join(broadcast(dfreq), "__t")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n_docs") - col("__nt") + 0.5) / (col("__nt") + 0.5) + 1.0))
      .withColumn("__s",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    // fixed-order term sum (pivot, then t1 + t2 + …): an unordered double
    // aggregate would make the total order-dependent and unoracleable
    val pivoted = scored.groupBy(col(idCol))
      .pivot("__t", terms)
      .agg(first(col("__s")))
    val total = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _)
    pivoted.select(col(idCol), total.as("score"))
  }

  /** Top-`k` BM25 hits, rank attached, ties on id. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(df, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
