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
        |       simhash62(array('a', 'b')) sh,
        |       simhash62_text('A  b') sht""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 6.0)
    assert(math.abs(r.getDouble(2) - 72.0) < 1e-9)
    assert(r.getSeq[Float](3) === Seq(0.6f, 0.8f))
    assert(r.getLong(4) === r.getLong(4)) // deterministic value present
    assert(r.getLong(5) === r.getLong(4)) // in-kernel tokenize ≡ array form
    val r2 = spark.sql(
      """SELECT char_shingles('abcd', 3) cs,
        |       word_shingles('a b c d', 2) ws,
        |       band_keys(minhash_signature(char_shingles('hello world', 5), 16), 4, 4) bk,
        |       sorted_intersect_size(sorted_hashes(array('a','b','c')),
        |                             sorted_hashes(array('b','c','d'))) ix,
        |       hash_embed('spark native engine', 16) he,
        |       lang_id('the cat is on the mat and it is the best') li,
        |       quality_score('A reasonable english sentence with the usual words.') q,
        |       text_stats('two tokens').n_tok_ws nt""".stripMargin).head()
    assert(r2.getSeq[String](0) === Seq("abc", "bcd"))
    assert(r2.getSeq[String](1) === Seq("a b", "b c", "c d"))
    assert(r2.getSeq[Long](2).length === 4)
    assert(r2.getInt(3) === 2)
    assert(math.abs(r2.getSeq[Float](4).map(x => x * x).sum - 1f) < 1e-5)
    assert(r2.getString(5) === "en")
    assert(r2.getDouble(6) >= 0.0 && r2.getDouble(6) <= 1.0)
    assert(r2.getInt(7) === 2)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("GraftConf: declared default lifts the top-k fallback threshold; any explicit user setting wins") {
    // newSession shares the context but owns its SQLConf — isolation
    val fresh = TestSpark.spark.newSession()
    assert(!fresh.conf.getAll.contains(GraftConf.TopKFallbackKey))
    GraftConf.applySessionDefaults(fresh)
    assert(fresh.conf.get(GraftConf.TopKFallbackKey) === "65536")
    // idempotent
    GraftConf.applySessionDefaults(fresh)
    assert(fresh.conf.get(GraftConf.TopKFallbackKey) === "65536")
    // an explicit user setting — EVEN to Spark's own default value —
    // survives (the r15 guard compared against "128" and clobbered it)
    val pinned = TestSpark.spark.newSession()
    pinned.conf.set(GraftConf.TopKFallbackKey, "128")
    GraftConf.applySessionDefaults(pinned)
    assert(pinned.conf.get(GraftConf.TopKFallbackKey) === "128")
  }

}
