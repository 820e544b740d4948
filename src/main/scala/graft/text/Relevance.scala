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
 * Execution shape: per-term frequencies are COLUMNS computed inside one
 * tokenize pass (`size(filter(toks, = term))` per query term — |Q| is a
 * handful, so |Q| codegen'd counters per row beat exploding tokens into
 * rows), then ONE broadcast aggregate row carries N, avgdl and every
 * per-term document frequency. No shuffle touches the corpus at all —
 * the earlier shape's per-(doc, term) groupBy plus pivot re-keyed the
 * full table twice and measured 15.6× at the 10× scale probe; this plan
 * is two narrow scans (aggregate, then score) and stays linear. Every
 * input to the float math is an integer (tf, n_t, dl, N), so the double
 * expression tree is bit-reproducible in SQL: per-term scores are summed
 * in FIXED term order (tf=0 contributes exactly +0.0, as the old
 * pivot-coalesce did), keeping the result hash-match oracle-checkable.
 */
object Relevance {

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** `[<idCol>, score]` for every document containing ≥1 query term. */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms0: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = terms0.distinct // a duplicate term must not double its score
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // one tokenize pass: doc length + |Q| per-term counts as columns
    val tfCols = terms.indices.map(i =>
      size(filter(col("__toks"), t => t === lit(terms(i)))).as(s"__tf$i"))
    val counted = df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .select(col(idCol) +: size(col("__toks")).as("__dl") +: tfCols: _*)
    // ONE broadcast stats row: N, avgdl, and df per term (docs with tf>0)
    val statsAggs = Seq(
      count(lit(1)).as("__n_docs"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl")) ++
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"__nt$i"))
    val stats = counted.agg(statsAggs.head, statsAggs.tail: _*)
    // fixed-order term sum; a term the doc lacks contributes exactly +0.0
    // (0·idf over a strictly positive denominator), bit-equal to the old
    // pivot's coalesce(…, 0.0)
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val nt = col(s"__nt$i")
      val idf = log((col("__n_docs") - nt + 0.5) / (nt + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }
    val hasAnyTerm = terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _)
    counted.crossJoin(broadcast(stats))
      .filter(hasAnyTerm)
      .select(col(idCol), termScores.reduce(_ + _).as("score"))
  }

  /** Top-`k` BM25 hits, rank attached, ties on id. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(df, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /**
   * Multi-query BM25 — the batch surface a curation run needs (`queries`
   * is a DataFrame of `(qidCol, termsCol: array<string>)`; real mining
   * runs thousands of queries, not one). Returns the per-query top-`n`:
   * `[<qidCol>, <idCol>, score, rank]`, `rank` 1-based by
   * `(score desc, id asc)` within each query.
   *
   * Shape at scale — the inverted-postings join, not |Q| corpus scans:
   * tokenize once, keep only tokens in the UNION of query terms (a
   * broadcast semi-filter), aggregate `(doc, term) → tf`, then join the
   * broadcast query-term and document-frequency tables. Work is
   * Σ_t df(t)·qf(t) — the true postings volume — independent of |Q|·N.
   * Per-(query, doc) scores fold in ascending TERM order
   * (`aggregate(array_sort(...))`, the [[graft.text.Importance]]
   * discipline) so the double sum is order-stable and oracle-matchable;
   * the per-query top-n is a rank window that compiles to
   * WindowGroupLimit — partial top-n before the exchange, no corpus
   * sort.
   */
  def bm25Batch(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termsCol: String, n: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(col(termsCol))).as("__term"))
    val termSet = qterms.select(col("__term")).distinct()
    // scan 1: corpus stats (N over every doc, avgdl over non-null texts —
    // the same population the single-query path aggregates)
    val stats = df.select(size(toks(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("__n_docs"),
        (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    // scan 2: postings restricted to query terms before any shuffle.
    // The token array MUST materialize in its own projection below the
    // explode: written as one projection (`size(toks(text)),
    // explode(toks(text))`), the size expression ends up above the
    // Generate with `text` as the child output and the full tokenize
    // re-runs PER EXPLODED ROW — measured 3.7 s vs 0.3 s at sf0.1 for
    // this stage alone. Two selects keep `__ts` a materialized child
    // attribute (CollapseProject won't inline a non-cheap expression
    // referenced twice — the same shape the single-query path uses).
    val tf = df
      .select(col(idCol), toks(col(textCol)).as("__ts"))
      .select(col(idCol), size(col("__ts")).as("__dl"),
        explode(col("__ts")).as("__term"))
      .join(broadcast(termSet), Seq("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    // per-term document frequency as a WINDOW over the (small) postings
    // stream, not a groupBy + broadcast join: broadcasting nt would run
    // the whole corpus tokenize+explode subtree a second time as the
    // broadcast's own job (tf is unpersisted by design — its ROWS are
    // tiny but COMPUTING it is a full corpus scan). The window adds one
    // shuffle of the term-restricted postings — postings-volume work —
    // and the corpus is scanned exactly twice (stats + postings), which
    // at sf0.1 took the three batch-retrieval gates from ~3.8-4.3 s to
    // the cost of their actual data volume.
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("__term"))
    val idf = log((col("__n_docs") - col("__nt") + 0.5) / (col("__nt") + 0.5) + 1.0)
    val s = idf * (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val perTerm = tf
      .withColumn("__nt", count(lit(1)).over(wTerm))
      .join(broadcast(qterms), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col("__qid"), col(idCol), col("__term"), s.as("__s"))
    val scored = perTerm.groupBy(col("__qid"), col(idCol))
      .agg(aggregate(array_sort(collect_list(struct(col("__term"), col("__s")))),
        lit(0.0), (acc, x) => acc + x.getField("__s")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("__qid").as(qidCol), col(idCol), col("score"), col("rank"))
  }
}
