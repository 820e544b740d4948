package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.encoders.PassthroughEncoder

/** faiss `PCAn,…` / `PCAWn,…` vector-transform prefix: centered PCA
  * (optionally whitened) fitted on the corpus at `fit`, inner index
  * trained in the reduced space, queries projected through the same
  * kernel at search. */
class PcaSpec extends SparkSpec {

  private def searcher(param: String, measurement: String = "cos") =
    new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = measurement, indexParam = param, nprobe = 8))

  test("PCAW16,Flat: dim reduced, self-match at rank 0, save/load identical, add works") {
    val emb = sf("embeddings")
    val a = emb.filter(col("vec_id") < 400)
    val b = emb.filter(col("vec_id") >= 400)
    val q = emb.filter(col("vec_id") < 5)
    for (param <- Seq("PCAW16,Flat", "PCA16,Flat")) {
      val model = searcher(param).fit(a)
      assert(model.dim === 16, s"param $param: projected dim")
      val res = model.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
      // a query IS its own projection — exact self-match survives PCA
      assert(res.filter(col("rank_no") === 0 &&
        col("sim_item").cast("long") === col("vec_id")).count() === 5, s"param $param")
      val before = res.select("vec_id", "rank_no", "sim_item", "sim_val")
        .collect().map(_.toSeq).toSet
      val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
      model.save(dir)
      val loaded = SparkSearcher.load(spark, dir)
      assert(loaded.dim === 16, s"param $param")
      val after = loaded.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
        .select("vec_id", "rank_no", "sim_item", "sim_val").collect().map(_.toSeq).toSet
      assert(after === before, s"param $param")
      // added rows project through the FITTED kernel (not a refit)
      val grown = loaded.add(b)
      assert(grown.count === emb.count(), s"param $param")
      val wide = grown.search(emb.filter(col("vec_id") >= 495), 3,
        keepRankNo = true, queryIdCol = Some("vec_id"))
      assert(wide.filter(col("rank_no") === 0 &&
        col("sim_item").cast("long") === col("vec_id")).count() === 5, s"param $param")
      grown.unpersist(); model.unpersist()
    }
  }

  test("PCA composes with quantized inner indexes (PCAW16,IVF8,SQ8 / PCAW16,PQ4)") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") < 5)
    for (param <- Seq("PCAW16,IVF8,SQ8", "PCAW16,PQ4", "PCAW16,SQfp16")) {
      val model = searcher(param).fit(emb)
      assert(model.dim === 16, s"param $param")
      val res = model.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
      // quantization after PCA may tie scores, but the self vector must
      // be retrieved (coarse-code ties are broken by row_id — the self
      // row appears in the top-5)
      assert(res.filter(col("sim_item").cast("long") === col("vec_id")).count() === 5,
        s"param $param")
      val dir = java.nio.file.Files.createTempDirectory("graft-pcaq").toString
      model.save(dir)
      val loaded = SparkSearcher.load(spark, dir)
      val before = res.select("vec_id", "rank_no", "sim_item", "sim_val")
        .collect().map(_.toSeq).toSet
      val after = loaded.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
        .select("vec_id", "rank_no", "sim_item", "sim_val").collect().map(_.toSeq).toSet
      assert(after === before, s"param $param")
      loaded.unpersist(); model.unpersist()
    }
  }

  test("PCAW16 recall@10 vs exact on cos stays useful after 4x reduction") {
    val emb = sf("embeddings")
    val exact = searcher("Flat").fit(emb)
    val pca = searcher("PCAW16,Flat").fit(emb)
    val qs = emb.filter(col("vec_id") < 50)
    def hits(m: SearcherModel) = m.search(qs, 10, keepRankNo = true,
        queryIdCol = Some("vec_id"))
      .select(col("vec_id"), col("sim_item").cast("long"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val he = hits(exact); val hp = hits(pca)
    val recall = he.keys.toSeq.map(k => hp(k).intersect(he(k)).size.toDouble / 10).sum / he.size
    info(f"PCAW16 recall@10 vs exact: $recall%.3f")
    assert(recall >= 0.2, f"PCAW16 recall@10 $recall%.3f below floor")
    pca.unpersist(); exact.unpersist()
  }

  test("normVec + non-cos metric: queries normalize BEFORE projecting (fit's order)") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val model = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "l2", indexParam = "PCAW16,Flat", normVec = true)).fit(emb)
    val res = model.search(q, 3, keepRankNo = true, queryIdCol = Some("vec_id"))
    // fit stores project(normalize(x)); a query x must travel the SAME
    // pipeline, so its self-distance is exactly 0 — normalize(project(x))
    // (the inverted order) lands at a scaled point with self-dist > 0
    val self = res.filter(col("rank_no") === 0)
      .select(col("vec_id"), col("sim_item").cast("long"), col("sim_val"))
      .collect()
    assert(self.length === 5)
    self.foreach { r =>
      assert(r.getLong(1) === r.getLong(0), s"query ${r.getLong(0)} self-match")
      assert(r.getFloat(2) === 0.0f, s"query ${r.getLong(0)} self-distance")
    }
    model.unpersist()
  }

  test("IDMap composes with the PCA prefix (IDMap,PCAW16,Flat)") {
    val emb = sf("embeddings")
    val m = searcher("IDMap,PCAW16,Flat").fit(emb.filter(col("vec_id") < 100))
    assert(m.dim === 16)
    assert(m.search(emb.filter(col("vec_id") < 3), 2,
      keepRankNo = true, queryIdCol = Some("vec_id"))
      .filter(col("rank_no") === 0 && col("sim_item").cast("long") === col("vec_id"))
      .count() === 3)
    m.unpersist()
  }

  test("parsing: malformed spellings raise; prefix requires an inner index") {
    // bare PCA with no inner index is not a valid factory string
    intercept[IllegalArgumentException](searcher("PCA16").strategy)
    // the prefix parses away cleanly: inner strategy is what's left
    assert(searcher("PCAW16,IVF8,Flat").strategy === IvfFlat(8))
    assert(searcher("PCA16,HNSW8").strategy === HnswGraph(8))
    assert(searcher("Flat").pcaSpec === None)
    assert(searcher("PCAW16,Flat").pcaSpec === Some((16, true, false)))
    assert(searcher("PCA16,Flat").pcaSpec === Some((16, false, false)))
    assert(searcher("PCAR16,Flat").pcaSpec === Some((16, false, true)))
    // n_components > dim fails at fit (VecsWhitening precondition)
    val emb = sf("embeddings")
    intercept[IllegalArgumentException](searcher("PCAW128,Flat").fit(emb))
  }

  test("PCAR: rotation is orthonormal-composed — served neighbor set equals plain PCA") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") < 5)
    def ids(spelling: String): Seq[(Long, Long)] =
      searcher(spelling).fit(emb)
        .search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
        .select(col("vec_id").cast("long"), col("sim_item").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // orthonormal Q preserves dot products/L2 exactly up to float rounding:
    // the NEIGHBOR SET matches the un-rotated PCA at full rank
    assert(ids("PCAR16,Flat") === ids("PCA16,Flat"))
    // and the composed kernel is genuinely rotated (not a silent PCA):
    // kernels differ even though the served geometry is identical
    val m0 = new graft.whitening.VecsWhitening(16, whiten = false)
      .fit(emb.select(col("embedding").cast("array<float>").as("v")), "v")
    val mr = SparkSearcher.composeRotation(m0, 16)
    assert(m0.kernel.flatten.toSeq != mr.kernel.flatten.toSeq)
    // orthonormality of the composition: Gram matrix of Q via the two
    // kernels' difference is implicit — assert norms preserved instead
    val x = Array.tabulate(m0.kernel.length)(i => (i % 7).toDouble / 7.0)
    def proj(m: graft.whitening.VecsWhiteningModel): Array[Double] = {
      val n = m.kernel(0).length
      Array.tabulate(n) { j =>
        var s = 0.0
        for (i <- m.kernel.indices) s += (x(i) + m.bias(i)) * m.kernel(i)(j)
        s
      }
    }
    val (y0, yr) = (proj(m0), proj(mr))
    val n0 = math.sqrt(y0.map(v => v * v).sum)
    val nr = math.sqrt(yr.map(v => v * v).sum)
    assert(math.abs(n0 - nr) < 1e-9 * math.max(1.0, n0))
  }
}
