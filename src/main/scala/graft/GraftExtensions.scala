package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.dedup.SimHash62
import graft.functions._

/**
 * Session-extension entry point: installs the engine's native functions in
 * every session created with
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`), making
 * them available to pure-SQL users cluster-wide — the deployment shape a
 * shared 1000-executor cluster expects, vs per-session `registerAll`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String,
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    def inject2(name: String, usage: String,
        f: (Expression, Expression) => Expression): Unit =
      inject(name, usage, es => f(es(0), es(1)))

    inject2("vec_dot", "inner product of two float vectors", VecDot)
    inject2("vec_cosine", "cosine similarity of two float vectors", VecCosine)
    inject2("vec_l1", "L1 (manhattan) distance", VecL1)
    inject2("vec_l2sq", "squared euclidean distance (faiss METRIC_L2)", VecL2Sq)
    inject2("vec_linf", "chebyshev distance", VecLInf)
    inject2("vec_bray_curtis", "Bray-Curtis dissimilarity", VecBrayCurtis)
    inject2("vec_canberra", "Canberra distance", VecCanberra)
    inject2("vec_jensen_shannon", "Jensen-Shannon divergence", VecJensenShannon)
    inject("vec_lp", "Minkowski-p pre-distance: vec_lp(a, b, p)", es =>
      VecLp(es(0), es(1), es(2).eval() match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case d: java.lang.Number => d.doubleValue()
        case other => throw new IllegalArgumentException(s"p must be numeric, got $other")
      }))
    inject("vec_l2_normalize", "L2-normalize a float vector",
      es => VecL2Normalize(es.head))
    inject("simhash62", "62-bit SimHash of an array of tokens",
      es => SimHash62(es.head))

    def intArg(e: Expression, what: String): Int = e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    // corpus-curation kernels, pure-SQL callable
    inject("char_shingles", "distinct character n-grams: char_shingles(text, n)",
      es => graft.dedup.CharShinglesExpr(es(0), intArg(es(1), "n")))
    inject("word_shingles", "distinct word w-grams: word_shingles(text, w)",
      es => graft.dedup.WordShinglesExpr(es(0), intArg(es(1), "w")))
    inject("minhash_signature",
      "MinHash signature of a shingle array: minhash_signature(shingles, numHashes)",
      es => {
        val (a, b) = graft.dedup.Dedup.minHashCoefficients(intArg(es(1), "numHashes"))
        graft.dedup.MinHashSignatureExpr(es(0), a, b)
      })
    inject("band_keys", "LSH band keys of a signature: band_keys(sig, bands, r)",
      es => graft.dedup.BandKeysExpr(es(0), intArg(es(1), "bands"), intArg(es(2), "r")))
    inject("sorted_hashes", "sorted 64-bit fingerprints of an array<string>",
      es => graft.dedup.SortedHashesExpr(es.head))
    inject2("sorted_intersect_size", "merge-scan |A∩B| of two sorted long arrays",
      graft.dedup.SortedIntersectSize)
    inject("hash_embed", "feature-hashing text embedding: hash_embed(text, dim)",
      es => graft.encoders.HashEmbedExpr(es(0), intArg(es(1), "dim")))
    inject("lang_id", "marker-profile language identification",
      es => graft.text.LangIdExpr(es.head))
    inject("quality_score", "composite document quality score in [0,1]",
      es => graft.text.QualityExpr(es.head))
    inject("text_stats",
      "struct(n_tok_ws, n_tok_bpe, mean_tok_len, punct_ratio, stopword_ratio)",
      es => graft.text.TextStatsExpr(es.head))
  }
}
