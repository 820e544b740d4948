package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.encoders.{HashEmbedKernel, HashEncoder}
import graft.functions.VectorFunctions
import graft.text.Relevance

/**
 * Hybrid lexical + dense retrieval with reciprocal-rank fusion — the
 * retrieval pattern every RAG / training-data-curation stack runs on top
 * of the reference's two scoring surfaces: BM25 keyword relevance
 * ([[graft.text.Relevance]]) and embedding similarity (the encoder-path
 * search of [[SparkSearcher]], reference faiss_searcher.py:160-185). The
 * reference exposes the two signals separately; fusing them is the
 * standard next step (RRF: Cormack/Clarke/Buettcher, SIGIR'09), kept
 * here rank-based so the fusion is score-scale-free and bit-reproducible
 * in a SQL oracle.
 *
 * `rrf(d) = Σ_lists 1/(rrfK + rank_list(d))` over the two top-`n`
 * candidate lists; documents missing from a list contribute nothing for
 * it. Ties broken by id everywhere, so the output is deterministic.
 *
 * Shape at scale: each candidate list is a single corpus scan feeding a
 * bounded top-n — BM25 is the zero-shuffle two-narrow-scans plan, the
 * dense side is one codegen'd hash-embed + dot-product projection into
 * `TakeOrderedAndProject` (map-side partial top-n, one tiny reduce; no
 * corpus shuffle, no sort of the full corpus). The fusion then joins two
 * ≤`n`-row lists — driver-scale small by construction. The 100 TB cost
 * is exactly two corpus scans, embarrassingly parallel.
 */
object HybridSearch {

  /** Worst-case ratio between a parquet-backed table's FREE Catalyst size
    * estimate (compressed provenance) and its in-flight row volume — the
    * same 4 MB-estimate ≈ 64 MB-in-flight figure Dedup.selfSizedParts
    * documents from the r13 probes (observed 4–20×). Broadcast guards
    * sized from the estimate must inflate by this before comparing
    * against driver capacity, or a mining-scale query table whose
    * COMPRESSED estimate slips under the bound OOMs the driver — the
    * exact failure the guard exists to prevent. The sentinel estimates
    * of non-file-backed plans (spark.sql.defaultSizeInBytes, Long.Max-
    * scale) inflate past any bound and safely degrade to shuffle joins. */
  private val EstimateInflation = 16L

  /**
   * Top-`k` fused hits: `[<idCol>, lex_rank, dense_rank, rrf_score]`,
   * ordered by fused score descending (ties on id). `lex_rank` /
   * `dense_rank` are 1-based positions in the BM25 / cosine candidate
   * lists, null when the document is outside that list's top `n`.
   *
   * The dense query vector is computed on the driver with the same
   * codegen kernel that embeds the corpus ([[HashEmbedKernel.embed]]) —
   * bounded state (one `dim`-float array), no extra job.
   */
  def hybridRrf(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], queryText: String, k: Int,
      n: Int = 50, rrfK: Int = 60, dim: Int = 64): DataFrame = {
    // the fused candidate union holds up to 2n docs, so k may exceed n
    require(k >= 1 && n >= 1, s"need k >= 1 and n >= 1, got k=$k n=$n")
    val id = col(idCol)

    // lexical candidates: zero-shuffle BM25 -> bounded top-n -> rank.
    // The window runs over <= n rows (post-limit), not the corpus.
    val lex = Relevance.bm25TopK(docs, idCol, textCol, terms, n)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, id.asc)))
      .select(id, col("lex_rank"))

    // dense candidates: embed corpus with the codegen kernel, dot against
    // the driver-computed unit query vector (corpus embeds are already
    // L2-normalized, so dot == cosine), TakeOrderedAndProject top-n.
    val qv: Array[Float] = {
      val a = HashEmbedKernel.embed(
        org.apache.spark.unsafe.types.UTF8String.fromString(queryText), dim)
      a.toFloatArray()
    }
    val dense = new HashEncoder(dim).encode(
        docs.filter(col(textCol).isNotNull), textCol, "__v")
      .select(id, VectorFunctions.vec_dot(col("__v"), typedlit(qv)).as("__s"))
      .orderBy(col("__s").desc, id.asc).limit(n)
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("__s").desc, id.asc)))
      .select(id, col("dense_rank"))

    // fusion over two tiny lists; fixed add order (lex + dense) keeps the
    // double bit-reproducible for the hash gate
    val fused = lex.join(dense, Seq(idCol), "full_outer")
      .select(id, col("lex_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)))
          .cast("float").as("rrf_score"))
    fused.orderBy(col("rrf_score").desc, id.asc).limit(k)
  }

  /**
   * Two-stage retrieve → rerank — the other canonical retrieval stack: a
   * cheap recall stage (BM25 top-`n`) followed by pair-interaction
   * scoring of ONLY those candidates ([[graft.encoders.PairScorer]], the
   * reference's cross-encoder surface, bert_encoder.py:187-192). Returns
   * top-`k` as `[<idCol>, bm25_rank, ce_score, rank]`, reranked by the
   * pair score (ties on id).
   *
   * Shape at scale: the recall stage is the zero-shuffle BM25 plan ending
   * in a bounded top-n; the candidate list (≤ n rows) then BROADCASTS
   * into one more corpus scan to recover the document text — the
   * expensive pair scoring touches only n rows, never the corpus. That
   * inversion (score candidates, not the corpus) is exactly why the
   * two-stage stack exists at 100 TB.
   */
  def rerank(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], queryText: String, k: Int,
      n: Int = 50, dim: Int = 64): DataFrame = {
    require(k >= 1 && n >= 1, s"need k >= 1 and n >= 1, got k=$k n=$n")
    val id = col(idCol)
    val cands = Relevance.bm25TopK(docs, idCol, textCol, terms, n)
      .withColumn("bm25_rank", row_number().over(
        Window.orderBy(col("score").desc, id.asc)))
      .select(id, col("bm25_rank"))
    // recover candidate text: broadcast the <=n-row list into the corpus
    // scan (never the corpus into the list)
    val withText = docs.select(id, col(textCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("__q", lit(queryText))
    val scored = new graft.encoders.PairScorer(new graft.encoders.HashEncoder(dim))
      .score(withText, "__q", textCol, "ce_score")
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(col("ce_score").desc, id.asc)))
      .filter(col("rank") <= k)
      .select(id, col("bm25_rank"), col("ce_score"), col("rank"))
  }

  /**
   * Batch hybrid RRF — the query-SET surface ([[hybridRrf]] is its
   * single-query special case; a real curation run fuses thousands of
   * queries). `queries` carries `(qidCol, termsCol: array<string>,
   * qTextCol: string)`. Returns per-query fused top-`k`:
   * `[<qidCol>, <idCol>, lex_rank, dense_rank, rrf_score]`.
   *
   * Shape at scale: the lexical side is the inverted-postings multi-query
   * BM25 ([[Relevance.bm25Batch]] — work = postings volume, not
   * |Q|·corpus); the dense side embeds the corpus ONCE and scores all
   * broadcast query vectors in the same scan, then takes per-query top-n
   * through a rank window that compiles to WindowGroupLimit (partial
   * top-n before the one exchange — no corpus sort, no cartesian
   * materialization beyond the scored stream itself). Fusion joins two
   * |Q|·n-row lists. Corpus cost: two scans, independent of |Q|.
   */
  def hybridRrfBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termsCol: String, qTextCol: String,
      k: Int, n: Int = 50, rrfK: Int = 60, dim: Int = 64,
      maxBroadcastBytes: Long = 64L << 20,
      denseIndex: Option[String] = None,
      autoIndexCorpusBytes: Long = 1L << 30,
      autoIndexMinQueries: Long = 512L): DataFrame = {
    require(k >= 1 && n >= 1, s"need k >= 1 and n >= 1, got k=$k n=$n")
    val id = col(idCol)
    // broadcast guard (mirrors removeBoilerplate's smallCorpusBytes): the
    // hard broadcast hints below assume a curation-scale query SET
    // (thousands). A mining-scale set (millions) must not die on a driver
    // broadcast OOM — past the bound the hints drop and the joins degrade
    // to shuffles. Decided from the FREE Catalyst size estimate of the
    // query table — no count() job on the common curation-scale path —
    // inflated by the worst observed parquet-compression undercount so
    // the bound measures in-flight bytes, not compressed provenance.
    val qBytes = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    val hintOk = qBytes * EstimateInflation <= maxBroadcastBytes
    def maybeBroadcast(d: DataFrame): DataFrame = if (hintOk) broadcast(d) else d
    val lex = Relevance.bm25Batch(docs, idCol, textCol, queries, qidCol,
        termsCol, n)
      .select(col(qidCol), id, col("rank").as("lex_rank"))
    // Dense side, two routes:
    //  - windowed (the curation default): embed the corpus once, score
    //    every broadcast query vector in the same scan, per-query top-n
    //    via a WindowGroupLimit rank window — |Q|·N scoring work AND a
    //    |Q|·N scored-stream exchange, right for curation-scale batches;
    //  - denseIndex = Some(factory): route through the searcher's index
    //    paths ([[SparkSearcher]]) — a mining-scale run (millions of
    //    queries) wants IVF/LSH pruning so each query scores a FRACTION
    //    of the corpus, and the bounded-heap top-k tail instead of the
    //    scored-stream window. "Flat" gives the exact bounded-heap plan;
    //    ranks may differ from the windowed route only on float-tie
    //    boundaries (the index route breaks ties by internal row id).
    // AUTO-ROUTE by measured work: when the corpus is big (free Catalyst
    // size estimate past `autoIndexCorpusBytes`) the windowed route's
    // scored-stream exchange is |Q|·N rows — there ONE count() of the
    // (small by construction) query table decides, and past
    // `autoIndexMinQueries` the dense side flips to the EXACT "Flat"
    // bounded-heap plan (same results up to float ties; approximate
    // pruning stays opt-in via an explicit `denseIndex`). At gate/
    // curation scale the corpus-bytes test fails first, so the default
    // plan — and its job count — is unchanged.
    val resolvedIndex: Option[String] = denseIndex.orElse {
      val docsBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      if (docsBytes > autoIndexCorpusBytes &&
          queries.count() > autoIndexMinQueries) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"hybridRrfBatch auto-route: corpus ~$docsBytes bytes and " +
            s"|Q| > $autoIndexMinQueries -> Flat index route (bounded-heap " +
            "top-n; windowed scored-stream exchange avoided)")
        Some("Flat")
      } else None
    }
    val dense = resolvedIndex match {
      case Some(factory) =>
        // __did: payload copy of the id — idCol itself becomes the
        // searcher's row_id and does not ride the output
        val model = new SparkSearcher(new HashEncoder(dim),
          SearcherParams(itemCol = Some(textCol), idCol = Some(idCol),
            measurement = "cos", indexParam = factory))
          .fit(docs.filter(col(textCol).isNotNull)
            .withColumn("__did", col(idCol)))
        model.search(
            queries.filter(col(qTextCol).isNotNull)
              .select(col(qidCol), col(qTextCol).as(textCol)),
            n, keepRankNo = true, queryIdCol = Some(qidCol))
          .select(col(qidCol), col("__did").as(idCol),
            (col("rank_no") + 1).cast("int").as("dense_rank"))
      case None =>
        // query vectors: the same codegen kernel that embeds the corpus,
        // normalized like HashEncoder output; |Q| rows, broadcast
        val qv = new HashEncoder(dim).encode(
            queries.filter(col(qTextCol).isNotNull), qTextCol, "__qv")
          .select(col(qidCol), col("__qv"))
        val denseScored = new HashEncoder(dim).encode(
            docs.filter(col(textCol).isNotNull), textCol, "__v")
          .select(id, col("__v"))
          .crossJoin(maybeBroadcast(qv))
          .select(col(qidCol), id,
            VectorFunctions.vec_dot(col("__v"), col("__qv")).as("__s"))
        val wDense = Window.partitionBy(col(qidCol))
          .orderBy(col("__s").desc, id.asc)
        denseScored.withColumn("dense_rank", row_number().over(wDense))
          .filter(col("dense_rank") <= n)
          .select(col(qidCol), id, col("dense_rank"))
    }
    val fused = lex.join(dense, Seq(qidCol, idCol), "full_outer")
      .select(col(qidCol), id, col("lex_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)))
          .cast("float").as("rrf_score"))
    val wFuse = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_score").desc, id.asc)
    fused.withColumn("__r", row_number().over(wFuse))
      .filter(col("__r") <= k)
      .select(col(qidCol), id, col("lex_rank"), col("dense_rank"),
        col("rrf_score"))
  }

  /**
   * Batch retrieve → rerank — the query-SET surface of [[rerank]].
   * `queries` carries `(qidCol, termsCol, qTextCol)`. Returns
   * `[<qidCol>, <idCol>, bm25_rank, ce_score, rank]`, per-query top-`k`
   * by pair score.
   *
   * Shape at scale: multi-query BM25 recall (postings join), then the
   * |Q|·n candidate list BROADCASTS into one corpus scan to recover
   * text; pair scoring touches candidates only, and the final per-query
   * top-k is a WindowGroupLimit rank window. The corpus is scanned
   * twice regardless of |Q|; the cross-encoder never sees it.
   */
  def rerankBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termsCol: String, qTextCol: String,
      k: Int, n: Int = 50, dim: Int = 64,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    require(k >= 1 && n >= 1, s"need k >= 1 and n >= 1, got k=$k n=$n")
    val id = col(idCol)
    // broadcast guard (mirrors removeBoilerplate's smallCorpusBytes): the
    // candidate list is |Q|·n rows — bounded and broadcastable for a
    // curation-scale query set, a driver OOM for a mining-scale one. Past
    // the bound the hints drop and both joins degrade to shuffle joins.
    // Sized from the FREE Catalyst estimate of the query table (no count()
    // job), inflated by the worst observed parquet-compression undercount
    // (see EstimateInflation): a candidate row (~32 B of ids + rank) is
    // conservatively at least a quarter of an average IN-FLIGHT query row
    // (id + terms + text), so candidate-list bytes ≲ qBytes·16·n/4.
    val qBytes = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    val hintOk = qBytes * EstimateInflation * n / 4 <= maxBroadcastBytes
    def maybeBroadcast(d: DataFrame): DataFrame = if (hintOk) broadcast(d) else d
    val cands = Relevance.bm25Batch(docs, idCol, textCol, queries, qidCol,
        termsCol, n)
      .select(col(qidCol), id, col("rank").as("bm25_rank"))
    val withText = docs.select(id, col(textCol))
      .join(maybeBroadcast(cands), Seq(idCol))
      .join(maybeBroadcast(queries.select(col(qidCol), col(qTextCol).as("__q"))),
        Seq(qidCol))
    val scored = new graft.encoders.PairScorer(new HashEncoder(dim))
      .score(withText, "__q", textCol, "ce_score")
    val w = Window.partitionBy(col(qidCol)).orderBy(col("ce_score").desc, id.asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), id, col("bm25_rank"), col("ce_score"), col("rank"))
  }
}
