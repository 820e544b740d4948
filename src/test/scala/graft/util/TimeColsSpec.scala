package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import java.sql.{Date, Timestamp}
import java.time.LocalDateTime

/** One case per physical encoding per column family: whatever parquet
  * type a driver regeneration ships (int64 epoch-nanos, timestamp[us],
  * naive timestamp, date32), the read-boundary normalizers must land on
  * the SAME contract value — ts → epoch-nanos long, date-family →
  * TimestampType. The r9 events.ts flip is the motivating incident. */
class TimeColsSpec extends SparkSpec {

  // 2024-03-15T12:30:45 UTC
  private val micros = 1710505845000000L
  private val nanos  = micros * 1000L

  private def df(schemaType: DataType, value: Any): DataFrame = {
    val schema = StructType(Seq(StructField("ts", schemaType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(value), Row(null)), schema)
  }

  test("epochNanos: long (nanosAsLong) passes through") {
    val d = df(LongType, nanos)
    val got = TimeCols.normalizeEpochNanos(d).select("ts").collect()
    assert(got(0).getLong(0) == nanos && got(1).isNullAt(0))
  }

  test("epochNanos: timestamp[us] UTC converts") {
    val d = df(TimestampType, new Timestamp(micros / 1000))
    val got = TimeCols.normalizeEpochNanos(d).select("ts").collect()
    assert(got(0).getLong(0) == nanos && got(1).isNullAt(0))
  }

  test("epochNanos: naive timestamp (NTZ) reinterprets as UTC") {
    val d = df(TimestampNTZType,
      LocalDateTime.ofEpochSecond(micros / 1000000, 0, java.time.ZoneOffset.UTC))
    val got = TimeCols.normalizeEpochNanos(d).select("ts").collect()
    assert(got(0).getLong(0) == nanos && got(1).isNullAt(0))
  }

  test("normalizeEpochNanos: absent column and already-long are no-ops") {
    val noTs = df(LongType, 1L).withColumnRenamed("ts", "other")
    assert(TimeCols.normalizeEpochNanos(noTs) eq noTs)
    val longTs = df(LongType, nanos)
    assert(TimeCols.normalizeEpochNanos(longTs) eq longTs)
  }

  // --- date-family contract: TimestampType whatever the physical type ---

  private def dateDf(schemaType: DataType, value: Any): DataFrame = {
    val schema = StructType(Seq(StructField("l_shipdate", schemaType, nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(Row(value), Row(null)), schema)
  }

  private def normalized(d: DataFrame): Array[Row] = {
    val out = TimeCols.normalizeTimestamp(d, Seq("l_shipdate"))
    assert(out.schema("l_shipdate").dataType == TimestampType)
    out.select(unix_micros(col("l_shipdate"))).collect()
  }

  test("normalizeTimestamp: timestamp[us] is a no-op") {
    val d = dateDf(TimestampType, new Timestamp(micros / 1000))
    assert(TimeCols.normalizeTimestamp(d, Seq("l_shipdate")) eq d)
    assert(normalized(d)(0).getLong(0) == micros)
  }

  test("normalizeTimestamp: int64 epoch-nanos (a ns-typed regeneration) truncates to micros") {
    val got = normalized(dateDf(LongType, nanos + 123L)) // sub-micro residue drops
    assert(got(0).getLong(0) == micros && got(1).isNullAt(0))
  }

  test("normalizeTimestamp: naive timestamp (NTZ) reinterprets as UTC") {
    val d = dateDf(TimestampNTZType,
      LocalDateTime.ofEpochSecond(micros / 1000000, 0, java.time.ZoneOffset.UTC))
    val got = normalized(d)
    assert(got(0).getLong(0) == micros && got(1).isNullAt(0))
  }

  test("normalizeTimestamp: date32 becomes midnight UTC") {
    val got = normalized(dateDf(DateType, Date.valueOf("2024-03-15")))
    // 2024-03-15T00:00:00Z
    assert(got(0).getLong(0) == 1710460800000000L && got(1).isNullAt(0))
  }

  test("normalizeTimestamp: absent columns are skipped") {
    val d = dateDf(TimestampType, new Timestamp(0L))
    assert(TimeCols.normalizeTimestamp(d, Seq("o_orderdate")) eq d)
  }
}
