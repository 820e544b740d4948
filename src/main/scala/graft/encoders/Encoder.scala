package graft.encoders

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

import graft.functions.VectorFunctions.{as_float_vec, vec_l2_normalize}

/**
 * The engine's pluggable text→vector surface, mirroring the reference's
 * `BaseEncoder.encode: List[str] → ndarray` contract
 * (/root/reference/backend/base_encoder.py:5-10). The reference accepts any
 * object with `encode`/`predict` (faiss_searcher.py:41-48); here any
 * implementation of this trait plugs into [[graft.search.SparkSearcher]].
 *
 * Unlike the reference's eager list-in/matrix-out shape, a Spark encoder is
 * a DataFrame→DataFrame projection: it appends `outCol: array<float>`
 * computed from `itemCol`. Distribution, batching and pipelining come from
 * the plan, not from the encoder.
 */
trait Encoder extends Serializable {
  /** Append `outCol: array<float>` derived from `df(itemCol)`. */
  def encode(df: DataFrame, itemCol: String, outCol: String): DataFrame

  /** Input columns consumed by this encoder that should NOT be treated as
    * payload by the searcher (e.g. the raw embedding column). */
  def sourceCols: Seq[String] = Nil

  /** Vector dimension if statically known (reference probes it by encoding
    * one item, faiss_searcher.py:56; we prefer declaring it). */
  def dim: Option[Int] = None
}

/**
 * No-op encoder for the raw-embedding flow (README.md:43-58): items already
 * carry a vector column. Mirrors the `encoder=None` + ndarray path
 * (faiss_searcher.py:37-38, 67-68) — the 2-D ndarray assert becomes a
 * schema check, and float32 coercion (faiss_searcher.py:92-94) a cast.
 */
final class PassthroughEncoder(vecCol: String) extends Encoder {
  override def sourceCols: Seq[String] = Seq(vecCol)
  override def encode(df: DataFrame, itemCol: String, outCol: String): DataFrame = {
    require(df.columns.contains(vecCol),
      s"PassthroughEncoder: column '$vecCol' not found in ${df.columns.mkString(",")}")
    df.schema(vecCol).dataType match {
      case ArrayType(_, _) => // ok — numeric element type coerced below
      case other => throw new IllegalArgumentException(
        s"PassthroughEncoder: '$vecCol' must be an array column, got $other " +
          "(mirrors the 2-D ndarray assert, faiss_searcher.py:67-68)")
    }
    df.withColumn(outCol, as_float_vec(col(vecCol)))
  }
}

/**
 * Deterministic feature-hashing text encoder — the JVM stand-in for the
 * reference's BERT encoder (bert_encoder.py:146-185), proving the O16
 * plug-in contract with reproducible vectors. Tokenizes on non-word chars
 * (lowercased, like the reference tokenizer's do_lower_case,
 * encoder_utils.py:56), hashes each token into one of `dimension` buckets
 * with a sign hash (classic hashing trick), then L2-normalizes — all in
 * one codegen'd kernel ([[HashEmbedExpr]]), bit-exactly reproducible in
 * DuckDB SQL so encoder-path searches get full oracles.
 */
final class HashEncoder(dimension: Int = 64) extends Encoder {
  override def dim: Option[Int] = Some(dimension)

  override def encode(df: DataFrame, itemCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, org.apache.spark.sql.graftshim.GraftSql.column(
      HashEmbedExpr(org.apache.spark.sql.graftshim.GraftSql.expression(
        col(itemCol).cast("string")), dimension)))
}

/**
 * Adaptive encoder — the reference's remote-or-local executor choice
 * (bert_encoder.py:151-157: use the remote bert-service if a 20 ms probe
 * passes, else the local model) behind the Encoder contract: probe once
 * with a wall-clock budget ([[graft.util.Timeout]], the O24 decorator),
 * then route every encode call to primary or fallback.
 */
final class FallbackEncoder(primary: Encoder, fallback: Encoder,
    probeMillis: Long)(probe: () => Boolean) extends Encoder {
  @transient private lazy val usePrimary: Boolean =
    try graft.util.Timeout.withTimeout(probeMillis)(probe())
    catch { case _: Throwable => false }
  private def active: Encoder = if (usePrimary) primary else fallback
  override def dim: Option[Int] = active.dim
  override def sourceCols: Seq[String] = active.sourceCols
  override def encode(df: DataFrame, itemCol: String, outCol: String): DataFrame =
    active.encode(df, itemCol, outCol)
}

/**
 * Batched encoder adapter — the Spark analog of the reference's
 * micro-batch generators (encoder_utils.py:48-75: tokenize, pad, emit
 * `batch_size` chunks). Wraps a whole-batch function `Seq[String] →
 * Seq[Array[Float]]` (exactly `BaseEncoder.encode`'s shape) and applies it
 * per partition in fixed-size groups via `mapPartitions` — the idiomatic
 * pattern for model-inference UDFs where per-row calls would waste
 * vectorization (a real BERT impl would run its forward pass in `f`).
 */
final class BatchedEncoder(f: Seq[String] => Seq[Array[Float]],
    batchSize: Int = 32, dimension: Int = 0) extends Encoder {
  override def dim: Option[Int] = if (dimension > 0) Some(dimension) else None

  override def encode(df: DataFrame, itemCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(itemCol)
    val fn = f
    val bs = batchSize
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val vecs = fn(batch.map(r => String.valueOf(r.get(idx))))
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(enc)
  }
}
