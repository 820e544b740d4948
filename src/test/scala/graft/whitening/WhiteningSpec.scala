package graft.whitening

import graft.SparkSpec
import graft.encoders.PassthroughEncoder
import org.apache.spark.sql.functions._

/** Whitening O20–O23: fitted output has mean≈0 and cov≈I (FIXTURES.md F3),
  * preconditions mirror the reference asserts, persistence round-trips. */
class WhiteningSpec extends SparkSpec {

  private def fittedOut(nComp: Int) = {
    val model = new VecsWhitening(nComp).fit(sf("embeddings"), "embedding")
    (model, model.transform(sf("embeddings"), "embedding"))
  }

  test("whitened output: mean ≈ 0, cov ≈ I (vecs_whitening.py:25-34)") {
    val (_, out) = fittedOut(8)
    val vecs = out.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val n = vecs.length; val d = 8
    val mean = new Array[Double](d)
    vecs.foreach(v => (0 until d).foreach(i => mean(i) += v(i) / n))
    mean.foreach(m => assert(math.abs(m) < 1e-4, s"mean $m"))
    // covariance diagonal ≈ 1, off-diagonal ≈ 0
    val cov = Array.ofDim[Double](d, d)
    vecs.foreach { v =>
      for (i <- 0 until d; j <- 0 until d)
        cov(i)(j) += (v(i) - mean(i)) * (v(j) - mean(j)) / (n - 1)
    }
    for (i <- 0 until d; j <- 0 until d) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - expect) < 0.05, s"cov($i,$j)=${cov(i)(j)}")
    }
  }

  test("dimension reduction to n_components") {
    val (_, out) = fittedOut(4)
    assert(out.select(size(col("embedding"))).head().getInt(0) === 4)
  }

  test("preconditions: n_components <= dim; rows > dim; transform dim check") {
    intercept[IllegalArgumentException](
      new VecsWhitening(100).fit(sf("embeddings"), "embedding"))
    intercept[IllegalArgumentException](
      new VecsWhitening(4).fit(sf("embeddings").limit(10), "embedding"))
    val (model, _) = fittedOut(4)
    val sp = spark
    import sp.implicits._
    intercept[Exception](
      model.transform(Seq(Seq(1f, 2f)).toDF("embedding"), "embedding").collect())
  }

  test("persistence round-trip + n_components mismatch (vecs_whitening.py:58-73)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bw").toString
    val (model, out) = fittedOut(8)
    model.save(spark, dir)
    val loaded = VecsWhiteningModel.load(spark, dir, expectComponents = Some(8))
    val a = out.select("embedding").head().getSeq[Float](0)
    val b = loaded.transform(sf("embeddings"), "embedding")
      .select("embedding").head().getSeq[Float](0)
    assert(a === b)
    intercept[IllegalArgumentException](
      VecsWhiteningModel.load(spark, dir, expectComponents = Some(4)))
  }

  test("WhitenedEncoder: lazy sampled fit inside the searcher (bert_encoder.py:159-177)") {
    val enc = new WhitenedEncoder(new PassthroughEncoder("embedding"), 8,
      sampleRows = 400)
    val model = new graft.search.SparkSearcher(enc,
      graft.search.SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id")))
      .fit(sf("embeddings"))
    assert(model.dim === 8)
    val res = model.search(sf("embeddings").filter(col("vec_id") < 2), 3,
      keepRankNo = true, queryIdCol = Some("vec_id"))
    assert(res.count() === 6)
  }
}
