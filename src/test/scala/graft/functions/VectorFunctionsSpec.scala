package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + property tests for the 8 reference metrics (O5) and normalize
  * (O3), against hand-computed values (FIXTURES.md F3). */
class VectorFunctionsSpec extends SparkSpec {
  import VectorFunctions._

  private def one(c: org.apache.spark.sql.Column): Double = {
    val sp = spark
    import sp.implicits._
    Seq((Seq(1f, 0f), Seq(0f, 1f), Seq(3f, 4f)))
      .toDF("e1", "e2", "v34").select(c).head().getDouble(0)
  }

  test("dot / cosine hand-computed") {
    assert(one(vec_dot(col("e1"), col("v34"))) === 3.0)
    assert(one(vec_cosine(col("e1"), col("e2"))) === 0.0)
    assert(math.abs(one(vec_cosine(col("e1"), col("v34"))) - 0.6) < 1e-12)
  }

  test("l1 / l2(squared, faiss convention) / linf / lp") {
    assert(one(vec_l1(col("e1"), col("v34"))) === 2.0 + 4.0)
    assert(one(vec_l2sq(col("e1"), col("v34"))) === 4.0 + 16.0)
    assert(one(vec_linf(col("e1"), col("v34"))) === 4.0)
    assert(math.abs(one(vec_lp(col("e1"), col("v34"), 3.0)) - (8.0 + 64.0)) < 1e-12)
  }

  test("brayCurtis / canberra / jensen-shannon") {
    // a=[1,0], b=[3,4]: BC = (2+4)/(4+4) = 0.75; Canberra = 2/4 + 4/4 = 1.5
    assert(one(vec_bray_curtis(col("e1"), col("v34"))) === 0.75)
    assert(one(vec_canberra(col("e1"), col("v34"))) === 1.5)
    // JS of identical distributions is 0
    assert(one(vec_jensen_shannon(col("v34"), col("v34"))) === 0.0)
    assert(one(vec_jensen_shannon(col("e1"), col("e2"))) > 0.0)
  }

  test("l2_normalize: unit norm; zero-vector guarded (reference NaNs, SURVEY §7.3)") {
    val sp = spark
    import sp.implicits._
    val out = Seq((Seq(3f, 4f), Seq(0f, 0f))).toDF("v", "z")
      .select(vec_l2_normalize(col("v")).as("nv"), vec_l2_normalize(col("z")).as("nz"))
      .head()
    assert(out.getSeq[Float](0) === Seq(0.6f, 0.8f))
    assert(out.getSeq[Float](1) === Seq(0f, 0f)) // guarded, not NaN
  }

  test("metric resolution mirrors faiss whitelist + ordering direction") {
    assert(metric("cos").higherIsCloser)
    assert(metric("ip").higherIsCloser)
    for (m <- Seq("l1", "l2", "l_inf", "l_p", "brayCurtis", "canberra", "jensen_shannon"))
      assert(!metric(m).higherIsCloser, m)
    intercept[IllegalArgumentException](metric("nope"))
  }

  test("dimension mismatch raises (faiss dim asserts)") {
    val sp = spark
    import sp.implicits._
    val ex = intercept[Exception] {
      Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
        .select(vec_cosine(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("property: normalize gives unit norm; cos(v,v)=1; metrics symmetric & non-negative") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(50)((
      List.fill(8)(rnd.nextFloat() * 20f - 10f),
      List.fill(8)(rnd.nextFloat() * 20f - 10f)))
    val rows = pairs.toDF("a", "b").select(
      vec_cosine(col("a"), col("a")).as("cself"),
      vec_l1(col("a"), col("b")).as("l1ab"),
      vec_l1(col("b"), col("a")).as("l1ba"),
      vec_l2sq(col("a"), col("b")).as("l2ab"),
      aggregate(transform(vec_l2_normalize(col("a")), x => x * x.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("n2")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cself") - 1.0) < 1e-6)
      assert(r.getAs[Double]("l1ab") === r.getAs[Double]("l1ba"))
      assert(r.getAs[Double]("l2ab") >= 0.0)
      assert(math.abs(r.getAs[Double]("n2") - 1.0) < 1e-5)
    }
  }
}
