package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operators beyond the built-in surface, each expressed as a
 * single-shuffle declarative plan (the shape that survives a 1000-executor
 * scale-up) and each with an exact DuckDB oracle.
 */
object Relational {

  /**
   * As-of (backward) join: for every left row, the latest right row of the
   * same key with `rightTime <= leftTime`. Implemented as union + one
   * window pass — ONE shuffle on the key, a sort within partitions, no
   * range cross-product (the naive `l.time >= r.time` theta-join explodes
   * quadratically per key; this is linear). Right rows must be unique per
   * `(keys, rightTime)` — pre-aggregate if not (ties would be
   * nondeterministic on any engine; DuckDB ASOF has the same contract).
   *
   * Returns all left columns plus `valueCols` from the matched right row
   * (null when no right row precedes).
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right-row payload travels as ONE struct, not per-value columns:
    // `last(..., ignoreNulls)` then selects the latest prior right ROW, so a
    // matched row whose value column is NULL is still the match (DuckDB ASOF
    // semantics) instead of being skipped in favor of an older non-null row.
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // align schemas: left side carries a null right-struct, right side
    // carries null left-payload; IS_LEFT orders right rows first at equal
    // times (inclusive <= semantics)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select((keys.map(col) :+ col("__t") :+ col("__is_left")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rvType).as("__rv"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select((keys.map(col) :+ col("__t") :+ col("__is_left")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__rv"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .select((keys.map(col) :+ col("__t") :+ col("__is_left")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        last(col("__rv"), ignoreNulls = true).over(w).as("__rvf"): _*)
    filled.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__rvf.$c").as(c)): _*)
  }

  /**
   * Exact discrete percentiles per group, rank-selection method: the
   * p-quantile is the value at sorted position `ceil(p·n)` — an actual
   * data value, so results are bit-exact and oracle-comparable (no
   * interpolation-arithmetic drift). One window pass + one aggregation.
   */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    // group sizes via an unordered window over the SAME partitioning: both
    // window specs share one exchange+sort, so the source is scanned and
    // shuffled ONCE (the earlier broadcast-joined counts aggregate cost a
    // full second scan of the fact table — 2× IO at scale), and the final
    // groupBy reuses the window's hash partitioning (no further exchange)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    ranked.groupBy(groupCols.map(col): _*)
      .agg(pctAgg(ps.head, valueCol), ps.tail.map(pctAgg(_, valueCol)): _*)
  }

  private def pctAgg(p: Double, valueCol: String): Column =
    max(when(col("__rn") === ceil(lit(p) * col("__n")), col(valueCol)))
      .as(s"p${(p * 100).round}")

  /**
   * Batch sessionization: gap-based session assignment via lag + running
   * sum — the batch twin of the streaming `flatMapGroupsWithState`
   * sessionizer ([[graft.streaming.StreamingOps.sessionize]]). One shuffle
   * on the key, two window passes over the same sort order (planned as a
   * single Window exec). Returns one row per `(key, session)` with start,
   * end, event count and value sum.
   */
  def sessionizeBatch(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gap, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("session_no"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(20, 2)))
          .cast("double").as("sum_value"))
  }

  /**
   * Skew-resilient equi-join: salt the (big, skewed) probe side into
   * `saltBuckets` sub-keys and replicate the build side across every salt
   * — the classic hot-key mitigation when one join key carries a
   * disproportionate share of rows (AQE's skew handling covers sort-merge
   * splits; explicit salting also redistributes the hash-aggregation that
   * follows). Output is EXACTLY the plain join's output, so the oracle is
   * the unsalted SQL join.
   */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int): DataFrame = {
    // Salt MUST be deterministic per row: it is a shuffle/join key, and a
    // nondeterministic source (monotonically_increasing_id, rand) re-assigns
    // salts on fetch-failure recompute or speculative re-execution, silently
    // duplicating/dropping rows vs the plain join. Hash the full row content
    // instead — identical rows share a salt, which is harmless (they carry
    // the same join key anyway), and recomputes are stable.
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
