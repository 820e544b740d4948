package graft.encoders

import graft.SparkSpec
import graft.util.Timeout
import java.util.concurrent.TimeoutException

/** O19 pair scoring + O24 timeout guard. */
class EncoderExtrasSpec extends SparkSpec {

  test("PairScorer: identical pair outscores unrelated pair (bert_encoder.py:187-192)") {
    val sp = spark
    import sp.implicits._
    val pairs = Seq(
      ("spark window agg", "spark window agg"),
      ("spark window agg", "zebra giraffe lion")).toDF("a", "b")
    val scored = new PairScorer(new HashEncoder(64)).score(pairs, "a", "b")
    assert(scored.columns.toSeq === Seq("a", "b", "score"))
    val rows = scored.collect()
    val self = rows.find(_.getString(1) == "spark window agg").get.getAs[Float]("score")
    val other = rows.find(_.getString(1) == "zebra giraffe lion").get.getAs[Float]("score")
    assert(math.abs(self - 1f) < 1e-5) // normalized self-dot
    assert(self > other)
  }

  test("FallbackEncoder: slow probe routes to fallback (bert_encoder.py:151-157)") {
    val sp = spark
    import sp.implicits._
    val df = Seq("a b c").toDF("text")
    val slow = new FallbackEncoder(new HashEncoder(8), new HashEncoder(16),
      probeMillis = 50)(() => { Thread.sleep(5000); true })
    assert(slow.encode(df, "text", "v").select("v").head().getSeq[Float](0).length === 16)
    val fast = new FallbackEncoder(new HashEncoder(8), new HashEncoder(16),
      probeMillis = 2000)(() => true)
    assert(fast.encode(df, "text", "v").select("v").head().getSeq[Float](0).length === 8)
  }

  test("Timeout.withTimeout: passes fast work, kills slow work (encoder_utils.py:26-35)") {
    assert(Timeout.withTimeout(5000)(21 * 2) === 42)
    intercept[TimeoutException](
      Timeout.withTimeout(50)({ Thread.sleep(5000); 1 }))
    // exceptions inside the body surface as themselves
    intercept[IllegalStateException](
      Timeout.withTimeout(5000)(throw new IllegalStateException("boom")))
  }

  test("Timeout.probeOrFallback: slow/failing probe falls back (bert_encoder.py:151-157)") {
    assert(Timeout.probeOrFallback(50)({ Thread.sleep(5000); true })("remote")("local")
      === "local")
    assert(Timeout.probeOrFallback(1000)(true)("remote")("local") === "remote")
    assert(Timeout.probeOrFallback(1000)(throw new RuntimeException)("remote")("local")
      === "local")
  }
}
