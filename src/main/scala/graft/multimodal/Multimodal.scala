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
/**
 * Pluggable media codec: the seam a real deployment fills with
 * JavaCV/TwelveMonkeys/ffmpeg bindings (the same pattern as
 * [[graft.encoders.Encoder]] — the reference blesses pluggable encode,
 * /root/reference/backend/faiss_searcher.py:41-48). Implementations must
 * be deterministic for a given payload (the oracle gates re-derive the
 * features) and serializable (instances ship to executors inside the
 * decode task closure).
 */
trait MediaDecoder extends Serializable {
  /** Decode one payload into a `dim`-dimensional feature vector.
    * A null payload must still return a (zero) vector of length `dim`. */
  def decode(payload: Array[Byte], dim: Int): Array[Float]

  /** Batch hook — real codecs amortize per-call setup (model load, native
    * context) across a batch; the default just maps [[decode]]. */
  def decodeBatch(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    payloads.map(decode(_, dim))
}

/** The deterministic stand-in codec (see [[Multimodal.stubDecode]]):
  * UTF-8 code-point histogram, L2-normalized — shape-compatible with a
  * real embedding and bit-reproducible in SQL. */
object StubDecoder extends MediaDecoder {
  override def decode(payload: Array[Byte], dim: Int): Array[Float] =
    Multimodal.stubDecode(payload, dim)
}

object Multimodal {

  /** Canonical media-row schema: id, modality tag, raw bytes, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /**
   * REAL binary ingestion: read media files through Spark's `binaryFile`
   * source into the canonical media schema. The id is parsed from the
   * trailing digits of each file name (`..._<id>.<ext>`); path, size and
   * mtime ride in `meta`. At scale this is the actual 100 TB entry point:
   * `binaryFile` splits per file across executors, filters on
   * `pathGlobFilter`/size push into the listing, and nothing is collected.
   */
  def ingestBinaryFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, modality: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1)
          .cast(LongType).as("media_id"),
        lit(modality).as("modality"),
        col("content").as("payload"),
        map(lit("path"), col("path"),
          lit("bytes"), col("length").cast(StringType),
          lit("mtime"), col("modificationTime").cast(StringType)).as("meta"))

  /** Deterministic binary fixture for the ingest gate: `n` files of
    * printable-ASCII bytes (`0x20 + (31·i + 7·j) mod 95`, length
    * `256 + 7·i`) written once under `dir` — byte-stable across runs and
    * engines, so the DuckDB oracle can `read_blob` the same files. ASCII
    * keeps byte==char positions, letting SQL reproduce the stub codec
    * exactly; the INGEST path (binaryFile → content bytes) is the real
    * one either way. Returns the directory for [[ingestBinaryFiles]]. */
  def ensureBinaryFixture(dir: String = "/tmp/graft_media_fixture",
      n: Int = 16): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    (0 until n).foreach { i =>
      val f = new java.io.File(d, f"media_$i%03d.bin")
      val len = 256 + 7 * i
      val bytes = Array.tabulate[Byte](len)(j => (0x20 + (31 * i + 7 * j) % 95).toByte)
      java.nio.file.Files.write(f.toPath, bytes)
    }
    dir
  }

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
   * batching matters because real codecs amortize per-call setup). The
   * codec is pluggable ([[MediaDecoder]]); each batch goes to
   * `decodeBatch` in one call. Appends `features: array<float>`.
   */
  def decodeFeatures(media: DataFrame, dim: Int = 32, batchSize: Int = 64,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](idx)), dim)
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
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
