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

  test("binaryFile ingest: real files → canonical media schema, parsed ids, exact bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    graft.multimodal.Multimodal.ensureBinaryFixture(dir, n = 4)
    val media = graft.multimodal.Multimodal
      .ingestBinaryFiles(spark, dir, "image", glob = "*.bin")
    val rows = media.orderBy("media_id").collect()
    assert(rows.length === 4)
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "modality", "payload", "meta"))
    // ids parsed from trailing digits of the file name
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    // bytes round-trip exactly (content column IS the file)
    val p2 = rows(2).getAs[Array[Byte]]("payload")
    val expect2 = Array.tabulate[Byte](256 + 14)(j => (0x20 + (31 * 2 + 7 * j) % 95).toByte)
    assert(p2.toSeq === expect2.toSeq)
    assert(rows.forall(_.getString(1) == "image"))
    // meta carries path + size
    val meta0 = rows(0).getMap[String, String](3)
    assert(meta0("bytes") === "256")
    assert(meta0("path").endsWith("media_000.bin"))
  }

  test("MediaDecoder is pluggable: a custom codec replaces the stub in decodeFeatures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media2").toString
    graft.multimodal.Multimodal.ensureBinaryFixture(dir, n = 3)
    val media = graft.multimodal.Multimodal
      .ingestBinaryFiles(spark, dir, "audio", glob = "*.bin")
    object LengthDecoder extends graft.multimodal.MediaDecoder {
      override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
        val out = new Array[Float](dim)
        out(0) = if (payload == null) 0f else payload.length.toFloat
        out
      }
    }
    val feats = graft.multimodal.Multimodal
      .decodeFeatures(media, dim = 4, decoder = LengthDecoder)
      .select(col("media_id"), col("features")).orderBy("media_id").collect()
    assert(feats.map(_.getSeq[Float](1).head).toSeq === Seq(256f, 263f, 270f))
    assert(feats.forall(_.getSeq[Float](1).drop(1).forall(_ == 0f)))
  }
}
