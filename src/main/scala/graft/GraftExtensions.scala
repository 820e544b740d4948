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
  }
}
