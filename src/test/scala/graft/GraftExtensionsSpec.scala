package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment surface: a session built with GraftExtensions
  * serves the engine's functions to pure SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions usable from SQL") {
    // getOrCreate returns any existing session (ignoring withExtensions):
    // clear active/default so a fresh session is built over the shared
    // context with the extensions applied, then restore
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
    val r = spark.sql(
      """SELECT vec_cosine(array(3.0F, 4.0F), array(3.0F, 4.0F)) c,
        |       vec_l1(array(1.0F, 0.0F), array(3.0F, 4.0F)) l1,
        |       vec_lp(array(1.0F, 0.0F), array(3.0F, 4.0F), 3.0) lp,
        |       vec_l2_normalize(array(3.0F, 4.0F)) nv,
        |       simhash62(array('a', 'b')) sh""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 6.0)
    assert(math.abs(r.getDouble(2) - 72.0) < 1e-9)
    assert(r.getSeq[Float](3) === Seq(0.6f, 0.8f))
    assert(r.getLong(4) === r.getLong(4)) // deterministic value present
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
