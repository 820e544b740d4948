package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media (image/audio/video) as opaque `binary`
 * payloads with typed metadata, processed by batched per-partition
 * decode/feature-extract operators. The Spark-side contract — schema,
 * partition-batched execution, feature shape — is real and tested; the
 * codec itself is STUBBED with a deterministic fake (no image/audio
 * libraries in this environment): a real deployment would swap
 * [[stubDecode]] for JavaCV/TwelveMonkeys/etc. behind the same signature.
 */
object Multimodal {

  /** Canonical media-row schema: id, modality tag, raw bytes, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap any table into media rows, treating a string column's bytes as
    * the payload (demo ingestion; a real pipeline reads image/audio files
    * via `spark.read.format("binaryFile")`). */
  def ingestFromText(df: DataFrame, idCol: String, textCol: String,
      modality: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      col(textCol).cast(BinaryType).as("payload"),
      map(lit("origin"), lit(textCol),
        lit("bytes"), octet_length(col(textCol)).cast(StringType)).as("meta"))

  /**
   * STUB decoder: deterministic fake "decode + feature extraction" standing
   * in for a real media codec. Interprets the payload as UTF-8 and produces
   * a `dim`-bucket code-point histogram (L2-normalized) — shape-compatible
   * with a real embedding so everything downstream (similarity search,
   * dedup, clustering) runs unchanged, and bit-exactly reproducible in
   * DuckDB SQL (`ascii(ch) % dim` over `regexp_extract_all(text, '.')`,
   * so '\n' code points are skipped on both sides).
   */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Float](dim)
    if (payload != null) {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (cp != '\n'.toInt) counts(cp % dim) += 1f
        i += Character.charCount(cp)
      }
      var ss = 0.0
      counts.foreach(c => ss += c.toDouble * c)
      val norm = math.sqrt(ss)
      if (norm > 0) { i = 0; while (i < dim) { counts(i) = (counts(i).toDouble / norm).toFloat; i += 1 } }
    }
    counts
  }

  /**
   * Batched decode + featurize over media rows: `mapPartitions` in
   * fixed-size groups (the Scala analog of a pandas-batched decode UDF —
   * batching matters because real codecs amortize per-call setup).
   * Appends `features: array<float>`.
   */
  def decodeFeatures(media: DataFrame, dim: Int = 32, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real impl would hand the whole batch to the codec here
        batch.map { r =>
          val feats = stubDecode(r.getAs[Array[Byte]](idx), dim)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /**
   * Frame sampling over binary payloads — the video-pipeline shape: split
   * each payload into consecutive `frameBytes`-sized frames and keep every
   * `everyK`-th (a real codec would seek keyframes; the slicing, explode
   * and per-frame schema are the actual Spark plumbing either way).
   * Emits `[media_id, modality, frame_no, payload: binary]` — one row per
   * sampled frame, ready for [[decodeFeatures]].
   */
  def frameSample(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes)
      .cast("int")
    media
      .withColumn("__fno", explode(when(nFrames > 0,
        sequence(lit(0), nFrames - 1)).otherwise(array().cast("array<int>"))))
      .filter(col("__fno") % everyK === 0)
      .select(col("media_id"), col("modality"), col("__fno").as("frame_no"),
        col("payload").substr(col("__fno") * frameBytes + 1, lit(frameBytes))
          .as("payload"))
  }

  /** Average-pool feature resize: `fromDim` buckets → `toDim` by mean over
    * each contiguous group — the embedding-downsampling step of a media
    * pipeline, a pure array op (no codec involved). */
  def resizeFeatures(withFeatures: DataFrame, toDim: Int,
      featCol: String = "features"): DataFrame = {
    val f = col(featCol)
    // ceil division in INT domain (Column `/` is double division)
    val groupSize = ((size(f) + toDim - 1) / toDim).cast("int")
    withFeatures.withColumn(featCol,
      transform(sequence(lit(0), lit(toDim - 1)), i => {
        val sliced = slice(f, i * groupSize + 1, groupSize)
        (aggregate(sliced, lit(0.0), (acc, x) => acc + x) /
          greatest(size(sliced), lit(1))).cast("float")
      }))
  }

  /** Per-modality feature statistics — the downstream-analytics shape.
    * The double feat_sum goes through DECIMAL before the cross-row sum so
    * the aggregate is independent of row order (oracle-exact). */
  def featureStats(withFeatures: DataFrame): DataFrame =
    withFeatures
      .select(col("modality"), col("media_id"),
        octet_length(col("payload")).as("payload_bytes"),
        aggregate(col("features"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("feat_sum"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("payload_bytes")).as("total_bytes"),
        sum(col("feat_sum").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double").as("sum_feat"))
}
