package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampNTZType, TimestampType}

/**
 * Event-time column normalization. The testdata `events.ts` column has
 * shipped under different physical parquet types across driver
 * generations: epoch-nanos int64 (surfaced as LongType under
 * `spark.sql.legacy.parquet.nanosAsLong`), `timestamp[us]` without
 * timezone metadata (surfaced as TimestampNTZType), and plain
 * `timestamp[us]` UTC (TimestampType). All engine code and every DuckDB
 * oracle treats event time as an epoch-nanos long in UTC (DuckDB's
 * `epoch_ns(ts)` on a naive TIMESTAMP), so these helpers collapse the
 * three encodings to that one contract at the read boundary instead of
 * scattering type dispatch through every query.
 *
 * All engine sessions pin `spark.sql.session.timeZone=UTC`, so casting a
 * TimestampNTZ to Timestamp reinterprets the naive value as the UTC
 * instant — exactly what DuckDB's epoch functions do with its naive
 * TIMESTAMP.
 */
object TimeCols {

  /** `tsCol` of `df` as an epoch-nanos UTC instant (LongType column). */
  def epochNanos(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case LongType         => col(tsCol)
      case TimestampType    => unix_micros(col(tsCol)) * 1000L
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType)) * 1000L
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$tsCol': $other")
    }

  /** `df` with `tsCol` (if present) rewritten in place to epoch-nanos
    * LongType; no-op when already a long or when the column is absent. */
  def normalizeEpochNanos(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (!df.columns.contains(tsCol)) df
    else df.schema(tsCol).dataType match {
      case LongType => df
      case _        => df.withColumn(tsCol, epochNanos(df, tsCol))
    }

  /** The OTHER time contract: date-family columns (`l_shipdate`,
    * `o_orderdate`) are TimestampType in every relational query and a
    * naive TIMESTAMP in every oracle. The driver has already flipped one
    * column's physical parquet type between generations (events.ts,
    * round 9); this normalizes each named column present in `df` to
    * TimestampType whatever it shipped as — `timestamp[us]` (no-op),
    * `timestamp[ns]` (surfaces as LongType epoch-nanos under
    * `nanosAsLong`; truncates to micros), naive `timestamp` (NTZ →
    * reinterpret as UTC instant), or `date32` (midnight UTC). */
  def normalizeTimestamp(df: DataFrame, tsCols: Seq[String]): DataFrame =
    tsCols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case TimestampType    => d
        case LongType         =>
          d.withColumn(c, timestamp_micros((col(c) / 1000L).cast(LongType)))
        case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
        case DateType         => d.withColumn(c, col(c).cast(TimestampType))
        case other => throw new IllegalArgumentException(
          s"unsupported physical type for date-family column '$c': $other")
      }
    }

  /** `tsCol` as a proper TimestampType column (for watermarks / windows),
    * whatever its physical encoding. Nanos truncate to micros — Spark
    * timestamps are microsecond-precision. */
  def eventTime(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType         => timestamp_micros((col(tsCol) / 1000L).cast(LongType))
      case TimestampType    => col(tsCol)
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$tsCol': $other")
    }
}
