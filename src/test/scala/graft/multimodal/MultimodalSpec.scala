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
}
