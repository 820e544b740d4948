package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("ingest → batched stub decode → features: schema and determinism") {
    val media = Multimodal.ingestFromText(sf("documents"), "doc_id", "text", "text")
    assert(media.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val decoded = Multimodal.decodeFeatures(media, dim = 16, batchSize = 32)
    assert(decoded.schema.fieldNames.contains("features"))
    val rows = decoded.select("media_id", "features").orderBy("media_id").limit(5).collect()
    assert(rows.forall(_.getSeq[Float](1).length === 16))
    // deterministic: second run bit-identical
    val again = Multimodal.decodeFeatures(media, dim = 16, batchSize = 32)
      .select("media_id", "features").orderBy("media_id").limit(5).collect()
    assert(rows === again)
    // unit-norm feature vectors (stub normalizes)
    rows.foreach { r =>
      val n2 = r.getSeq[Float](1).map(x => x.toDouble * x).sum
      assert(math.abs(n2 - 1.0) < 1e-5)
    }
  }

  test("feature stats aggregate per modality") {
    val media = Multimodal.ingestFromText(sf("documents"), "doc_id", "text", "text")
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(media, 16))
      .collect()
    assert(stats.length === 1)
    assert(stats.head.getAs[Long]("n_media") === 500L)
    assert(stats.head.getAs[Long]("total_bytes") > 0L)
  }

  test("features feed the similarity engine unchanged (search over decoded media)") {
    val media = Multimodal.ingestFromText(sf("documents"), "doc_id", "text", "text")
    val feats = Multimodal.decodeFeatures(media, dim = 16)
      .select(col("media_id"), col("features"))
    val model = new graft.search.SparkSearcher(
      new graft.encoders.PassthroughEncoder("features"),
      graft.search.SearcherParams(itemCol = Some("media_id"),
        idCol = Some("media_id"))).fit(feats)
    val res = model.search(feats.limit(3), topK = 1, keepRankNo = true,
      queryIdCol = Some("media_id")).collect()
    assert(res.length === 3)
    // nearest neighbor of a media item is itself
    res.foreach(r => assert(r.getAs[Long]("media_id") === r.getAs[Long]("sim_item")))
    model.unpersist()
  }

  test("frameSample: every k-th fixed-size frame, partial tail kept, short payloads covered") {
    val media = Multimodal.ingestFromText(sf("documents"), "doc_id", "text", "video")
    val frames = Multimodal.frameSample(media, frameBytes = 64, everyK = 2)
    val byMedia = frames.groupBy("media_id")
      .agg(org.apache.spark.sql.functions.count(col("frame_no")).as("n"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.octet_length(col("payload"))).as("maxb"))
      .collect()
    assert(byMedia.nonEmpty)
    byMedia.foreach(r => assert(r.getAs[Int]("maxb") <= 64))
    // cross-check one media item against the expected frame count
    val one = sf("documents").select(col("doc_id"),
      org.apache.spark.sql.functions.octet_length(col("text")).as("b"))
      .head()
    val expected = (math.ceil(one.getAs[Int]("b") / 64.0).toInt + 1) / 2
    val got = frames.filter(col("media_id") === one.getAs[Long]("doc_id")).count()
    assert(got === expected)
  }

  test("resizeFeatures: average-pool halves the dim, preserves total sum") {
    val media = Multimodal.ingestFromText(sf("documents").limit(20), "doc_id", "text", "text")
    val f16 = Multimodal.decodeFeatures(media, dim = 16)
    val f4 = Multimodal.resizeFeatures(f16, toDim = 4)
    val rows = f4.select(col("features")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](0).length === 4)
    }
    // mean-pool of groups of 4: sum(resized)*4 == sum(original) (all groups full)
    val orig = f16.select(col("features")).collect().map(_.getSeq[Float](0).map(_.toDouble).sum)
    val resized = rows.map(_.getSeq[Float](0).map(_.toDouble).sum * 4)
    orig.zip(resized).foreach { case (o, rz) => assert(math.abs(o - rz) < 1e-4) }
  }
}
