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
   * Exact discrete percentiles via TWO-PASS HISTOGRAM NARROWING — the
   * 100 TB path for LOW-cardinality group sets, where [[exactPercentiles]]'s
   * full per-group sort (one window over every row) is the bottleneck:
   * sorting n rows costs n·log n and a full shuffle, while this plan is
   * two hash aggregations plus a window over only the ~n/bins rows that
   * land in rank-candidate buckets.
   *
   * TWO scans total. Pass 1 histograms the values into fixed
   * order-preserving buckets — the top `sign + exponent + log2(bins)`
   * bits of the IEEE-754 sortable-bits transform ([[DoubleOrderedBits]]),
   * so bucket order IS value order with ~`1/bins` relative width inside
   * every binade, and NO per-group min/max pre-pass or stats join is
   * needed (the earlier equal-width bucketing paid a third full scan for
   * the range; at sf100 that was one extra pass over the 11 GB lineitem).
   * The driver walks the cumulative counts to find, for each percentile,
   * the bucket holding the target rank `ceil(p·n)` and the rank offset
   * within it; pass 2 sorts ONLY the candidate buckets and picks the
   * value at that offset. The picked value is identical to
   * [[exactPercentiles]]'s rank selection (equal values always share a
   * bucket — ±0.0 is normalized in the transform — so the in-bucket rank
   * is well-defined on ties), and the same SQL oracle applies.
   *
   * Null handling matches the window variant exactly: null VALUES sort
   * first in a `row_number` over `orderBy(value)`, so they are binned
   * into the Long.MinValue bucket here (where the candidate window's
   * nulls-first order reproduces the same ranks); null GROUP KEYS are a
   * group of their own (all joins below are null-safe on the group
   * columns).
   *
   * Bounds: the driver collects one row per OCCUPIED (group, bucket) —
   * ≤ groups · binades-spanned · bins, intended for the analytics shape
   * (percentiles per flag/category/source, G in the hundreds). For
   * high-cardinality groups use [[exactPercentiles]]: each group is then
   * small, and the per-group sort is the right plan. Degenerate
   * distributions (one bucket holding a whole group, e.g. all values
   * equal) fall back to sorting that bucket — correct, at the window
   * variant's cost for that group only.
   */
  def exactPercentilesHist(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double], bins: Int = 8192): DataFrame = {
    require(bins > 1, s"bins must be > 1, got $bins")
    // the bucket id is the top (12 + log2(bins)) bits of the 64-bit
    // sortable transform, kept as a LONG (an int cast wrapped negative
    // past bins = 2^19, inverting bucket order across zero); bound bins
    // so the histogram stays a driver-collectable candidate set
    require(bins <= (1 << 24), s"bins must be <= 2^24, got $bins")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must lie in (0, 1], got $ps")
    // labels pivot the output columns; two ps that round to the same
    // integer percent (0.495 and 0.5 → p50) would silently merge columns
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"percentile labels collide after rounding to integer percents: $ps " +
        "— pass percentiles that map to distinct p<N> labels")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val v = col(valueCol)
    // null-safe broadcast join on the group columns: a NULL group key is
    // a group like any other (plain USING-join equality would silently
    // drop it — the window variant keeps it)
    def nsJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
      val renamed = keys.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
      val cond = keys.map(c => left(c) <=> renamed(s"__r_$c")).reduce(_ && _)
      keys.foldLeft(left.join(broadcast(renamed), cond))((d, c) => d.drop(s"__r_$c"))
    }
    // fixed order-preserving bucket: top (1 sign + 11 exponent + mBits
    // mantissa) bits of the sortable-bits transform. The double cast only
    // steers CANDIDATE selection (exactness comes from the rank pick
    // below), so decimal/float inputs are safe. Null values go to the
    // Long.MinValue bucket — the only negative id, since the real ids
    // are unsigned-shifted longs — so they rank FIRST under
    // orderBy(value) (Spark default nulls-first asc), same as the
    // window variant.
    import org.apache.spark.sql.graftshim.GraftSql.{column => toCol, expression => toExpr}
    val mBits = 63 - java.lang.Long.numberOfLeadingZeros(bins.toLong)
    val shift = 52 - mBits
    val vd = v.cast("double")
    val bucket = when(v.isNull, lit(Long.MinValue)).otherwise(
      shiftrightunsigned(toCol(DoubleOrderedBits(toExpr(vd))), shift))
    val bucketed = df.withColumn("__b", bucket)
    // pass 1: per-(group, bucket) counts — collected, one row per
    // occupied bucket
    val hist = bucketed.groupBy((g :+ col("__b")): _*)
      .agg(count(lit(1)).as("__c")).collect()
    val nG = groupCols.length
    val byGroup = hist.groupBy(r => Seq.range(0, nG).map(r.get))
    val labels = ps.map(p => s"p${(p * 100).round}")
    // driver: cumulative walk per group -> (bucket, in-bucket rank) per p
    val candRows = byGroup.toSeq.flatMap { case (gKey, rs) =>
      val counts = rs.map(r => (r.getLong(nG), r.getLong(nG + 1))).sortBy(_._1)
      val n = counts.map(_._2).sum
      ps.zip(labels).map { case (p, label) =>
        val target = math.ceil(p * n).toLong
        var cum = 0L
        var bi = 0
        while (bi < counts.length && cum + counts(bi)._2 < target) {
          cum += counts(bi)._2; bi += 1
        }
        org.apache.spark.sql.Row.fromSeq(
          gKey ++ Seq(counts(bi)._1, label, target - cum))
      }
    }
    val candSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => df.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__p",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__r",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val cands = spark.createDataFrame(
      spark.sparkContext.parallelize(candRows, 1), candSchema)
    // final: sort ONLY candidate-bucket rows (~n/bins per group per p),
    // pick the in-bucket rank. Ties in value share a bucket and a value,
    // so any tie order yields the same picked value.
    val candKeys = cands.select((g :+ col("__b")): _*).distinct()
    val w = Window.partitionBy((g :+ col("__b")): _*).orderBy(v)
    val picked = nsJoin(
        nsJoin(bucketed, candKeys, groupCols :+ "__b")
          .withColumn("__rn", row_number().over(w)),
        cands, groupCols :+ "__b")
      .filter(col("__rn") === col("__r"))
    picked.groupBy(g: _*).pivot("__p", labels).agg(first(v))
  }

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
  /**
   * Distributed EXCLUSIVE prefix sum over a global ordering: appends
   * `cum_before` = sum of `weightCol` over all rows strictly before this
   * row in `orderCol` order (`orderCol` must be unique — ties across rows
   * would make the running sum order-dependent).
   *
   * The naive formulation — `sum over (ORDER BY orderCol)` with no
   * PARTITION BY — collapses the whole dataset into ONE window partition:
   * a single-task stage that is the textbook scale-killer at 100 TB. This
   * is the two-pass scan algorithm instead: range-repartition on the order
   * column and sort within partitions; job 1 aggregates one total PER
   * PARTITION (a few hundred longs to the driver, bounded by partition
   * count, not data size); exclusive per-partition offsets are broadcast
   * back; job 2 adds the local running sum in a single mapPartitions pass
   * (genuine per-partition imperative state — the documented last-resort
   * tier, used precisely because no declarative operator expresses a
   * global scan without serializing it).
   */
  def prefixSum(df: DataFrame, orderCol: String, weightCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else shufflePartitions(spark)
    val w = col(weightCol).cast("long")
    val arranged = df
      .withColumn("__w", coalesce(w, lit(0L)))
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      // pinned: job 2's TaskContext partition ids must denote the same
      // physical partitions job 1 aggregated
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = arranged
      .groupBy(spark_partition_id().as("__pid")).agg(sum(col("__w")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = arranged.rdd.getNumPartitions
    // exclusive scan over the (tiny) per-partition totals
    val offs = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offs(p) = acc
      acc += partSums.getOrElse(p, 0L)
      p += 1
    }
    val offsB = spark.sparkContext.broadcast(offs)
    val schema = arranged.schema.add("cum_before",
      org.apache.spark.sql.types.LongType, nullable = false)
    val wIdx = arranged.schema.fieldIndex("__w")
    val out = arranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = offsB.value(pid)
      it.map { r =>
        val row = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(wIdx)
        row
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    // eager checkpoint BEFORE releasing the pinned input: job 2 runs
    // exactly once against the same physical partitions job 1 aggregated
    // (a lazy consumer could otherwise re-shuffle `arranged` after
    // eviction, silently invalidating the per-partition offsets), and the
    // corpus-sized arranged cache is freed instead of leaking. NOTE the
    // returned frame is input-sized and stays pinned (the price of the
    // once-and-only-once guarantee); long-lived sessions call
    // CacheDiscipline.release(result) when done with it.
    graft.util.CacheDiscipline.materializeAndFree(out.drop("__w"), arranged)
  }

  /**
   * Deterministic sequence packing — assign documents (in `orderCol`
   * order) to contiguous fixed-token-budget shards: shard k holds the rows
   * whose exclusive cumulative weight lands in `[k·budget, (k+1)·budget)`.
   * The contiguous-fill discipline training-data pipelines use to cut a
   * corpus into context-window-sized bins; a row straddling a boundary
   * stays in the earlier shard (bins overflow by < one row, never split a
   * document). Built on [[prefixSum]], so the plan has no single-partition
   * window.
   */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    prefixSum(df, orderCol, weightCol)
      .withColumn("shard", expr(s"cum_before div ${budget}L"))
  }

  /**
   * Temperature-damped source-mixing weights — the multinomial data-mixture
   * step of a training run (unigram-LM style: sample source `s` with
   * probability ∝ mass_s^(1/T); T=1 is proportional, larger T flattens
   * toward uniform). Returns per-source `[<sourceCol>, n_docs, n_tokens,
   * mix_weight]` with `mix_weight = (n_tokens / max_tokens)^(1/T)` — the
   * per-source KEEP RATE relative to the largest source.
   *
   * `temperature` must be a power of two: x^(1/2^j) is computed by
   * REPEATED `sqrt`, which IEEE requires correctly rounded — so the weight
   * is bit-reproducible across engines, unlike `pow(x, 1.0/T)` (the same
   * reason the fixed-√ mixing gate documents). One hash aggregation plus a
   * broadcast single-row max — no corpus-sized shuffle.
   */
  def temperatureMixWeights(df: DataFrame, sourceCol: String,
      tokenCount: Column, temperature: Int): DataFrame = {
    require(temperature >= 1 && (temperature & (temperature - 1)) == 0,
      s"temperature must be a power of two for sqrt-exact damping, got $temperature")
    def damp(c: Column, t: Int): Column = if (t == 1) c else damp(sqrt(c), t / 2)
    val perSource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
    val top = perSource.agg(max(col("n_tokens")).as("__max_tokens"))
    perSource.crossJoin(broadcast(top))
      .withColumn("mix_weight",
        damp(col("n_tokens").cast("double") / col("__max_tokens").cast("double"),
          temperature))
      .drop("__max_tokens")
  }

  /**
   * Apply mixing weights as an actual deterministic subsample: keep a row
   * iff `hash mod 1e6 < floor(mix_weight · 1e6)` — a content-hash
   * Bernoulli draw at the source's keep rate that is reproducible across
   * engines AND across recomputes (the hash is a pure row function;
   * `rand()` would re-draw on fetch-failure recompute, silently changing
   * the sample — same failure mode [[saltedEquiJoin]]'s salt note
   * documents). `weights` (one row per source) broadcasts past the corpus
   * scan; the filter runs in the same codegen stage.
   */
  def mixSample(docs: DataFrame, sourceCol: String, rowHash: Column,
      weights: DataFrame): DataFrame =
    docs.join(broadcast(weights.select(col(sourceCol), col("mix_weight"))),
        Seq(sourceCol))
      .filter(pmod(rowHash, lit(1000000L)) <
        floor(col("mix_weight") * lit(1000000.0)).cast("long"))

  /** `buildHash` (r18): pick the salted join's physical shape.
    * - `"none"` (default): sort-merge — the ROBUST shape; SMJ's sorts
    *   spill gracefully, and a salted join exists for skewed BIG data
    *   (the r17 A/B measured shuffle-hash OOM-ing — "not enough memory
    *   to build hash map", the build map cannot spill — when the build
    *   side was the 60M-row replicated dim).
    * - `"big"`: shuffled-hash with the build map on the BIG side's
    *   partitions. Opt-in for callers who have STRUCTURALLY bounded the
    *   big side first — e.g. pre-aggregated to one row per join key —
    *   so the per-partition build map is (distinct keys / shuffle
    *   partitions) narrow rows, not the raw fact stream. This removes
    *   BOTH sort passes: the ×`saltBuckets`-replicated small side
    *   streams through probe-only (the r18 q_salted_join gate measured
    *   118 s / 36 GB sort spill → this shape, at sf100). Size
    *   `spark.sql.shuffle.partitions` so the build side fits executor
    *   memory — the build map cannot spill; that is the contract you
    *   accept for dropping the sorts. r19: the contract is byte-GUARDED
    *   at runtime (`buildBudgetBytes`) — an unbounded build side falls
    *   back to sort-merge instead of OOMing. */
  /** `saltBuckets = 0` (auto) resolution: measure the hot key instead of
    * guessing a constant. One narrow key-histogram aggregation over the
    * big side (partial-agg'd, one column) finds the largest key's row
    * SHARE `s`; salting splits that key into `b` slices of `s/b` each,
    * so the smallest `b` that caps the largest slice at one partition's
    * fair share of the work is `ceil(s · P)` (P = shuffle partitions),
    * clamped to [1, P] — more than P slices cannot spread further than P
    * tasks. Uniform keys resolve to 1 = salting is a no-op (the honest
    * answer: a fixed bucket count on uniform data pays replication for
    * nothing — the r18 gate's fixed 4 costs a ×4 replicated 60M-row sort
    * stream at sf100 that an auto would have skipped). A FIXED bucket
    * count is scale-blind in both directions: too few buckets under-split
    * a worsening hot key, too many multiply the replicated side as the
    * dim grows. */
  private[graft] def resolveSaltBuckets(big: DataFrame, bigKey: String): Int = {
    import org.apache.spark.sql.functions.{count => fcount}
    val row = big.groupBy(col(bigKey))
      .agg(fcount(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__max"), sum(col("__n")).as("__total"))
      .head()
    if (row.isNullAt(0) || row.getLong(1) == 0L) return 1
    val share = row.getLong(0).toDouble / row.getLong(1)
    val p = shufflePartitions(big.sparkSession)
    math.max(1, math.min(p, math.ceil(share * p).toInt))
  }

  /** Auto salt buckets derived from a caller-supplied per-key
    * PRE-AGGREGATION of the side to be salted — the no-extra-scan twin of
    * [[resolveSaltBuckets]]. The aggregate-below-the-join pattern
    * (q_salted_join) materializes one row per join key, with a per-key
    * row count, IMMEDIATELY upstream of the salted join; that frame IS
    * the side being salted, so its hot-key share is `1/N` by construction
    * (every key holds exactly one row) and the raw skew it absorbed reads
    * off the count column — both from ONE narrow aggregation over the
    * pre-agg, instead of re-running a corpus-wide key histogram over a
    * plan that will execute AGAIN for the join. Persist the pre-agg
    * before calling when the same frame feeds the join, so measurement
    * and join share a single computation.
    */
  private[graft] def resolveSaltBucketsFromPreAgg(preAgg: DataFrame,
      countCol: String): Int = {
    import org.apache.spark.sql.functions.{count => fcount}
    val r = preAgg.agg(fcount(lit(1)).as("__n"),
      max(col(countCol).cast("long")).as("__hot"),
      sum(col(countCol).cast("long")).as("__tot")).head()
    if (r.getLong(0) == 0L) return 1
    val n = r.getLong(0)
    val absorbed = if (!r.isNullAt(2) && r.getLong(2) > 0L)
      r.getLong(1).toDouble / r.getLong(2) else 0.0
    val p = shufflePartitions(preAgg.sparkSession)
    val b = math.max(1, math.min(p, math.ceil(p.toDouble / n).toInt))
    org.slf4j.LoggerFactory.getLogger("graft.operators.Relational").info(
      f"saltedEquiJoin auto (from pre-agg): $n one-per-key rows " +
        f"(salted-side share 1/$n; absorbed raw hot-key share " +
        f"$absorbed%.6f) -> $b salt bucket(s)")
    b
  }

  /** `spark.sql.shuffle.partitions` as an Int, tolerating non-numeric
    * values (e.g. "auto" on AQE-managed deployments) by falling back to
    * the cluster's default parallelism. With AQE coalescing the static
    * setting is an UPPER BOUND on the real post-shuffle task count —
    * the conservative direction for salt-bucket sizing (more slices than
    * tasks spreads no further, but never under-splits a hot key). */
  private[graft] def shufflePartitions(
      spark: org.apache.spark.sql.SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** `buildBudgetBytes` (r19): per-partition byte budget for the
    * `buildHash = "big"` build map. The shuffled-hash build map CANNOT
    * spill (the exact OOM the r17 A/B measured when the build side was
    * the 60M-row replicated dim), so before applying the hint the build
    * side's bytes are estimated from the plan's stats — the same pattern
    * as the payload gather-join's byte-guarded broadcast — and the join
    * falls back to sort-merge (warn logged) above the budget. The
    * estimate errs in the safe direction: non-CBO stats don't shrink
    * through aggregates, so a genuinely bounded build side can read
    * large and take the always-correct SMJ shape, but an unbounded one
    * can never take the cannot-spill shape. Raise the budget explicitly
    * for a side you have measured to fit executor memory. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int,
      buildHash: String = "none",
      buildBudgetBytes: Long = 1L << 30): DataFrame = {
    require(Set("none", "big").contains(buildHash),
      s"buildHash must be 'none' (sort-merge) or 'big', got '$buildHash'")
    require(saltBuckets >= 0, s"saltBuckets must be >= 0 (0 = auto), got $saltBuckets")
    val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Relational")
    val buckets =
      if (saltBuckets > 0) saltBuckets
      else {
        // the histogram is an EAGER job, and the join returned below
        // recomputes `big` from scratch — pin the frame across both
        // (MEMORY_AND_DISK, evictable) so measurement + join share ONE
        // computation of what can be a corpus-scale pre-aggregation (at
        // sf100 the unpinned auto gate executed a 60M-row groupBy twice
        // per run). The pin is keyed by plan, so repeated calls reuse one
        // cache entry; callers who want the blocks back call
        // `big.unpersist()` after consuming the join, and callers who
        // already HOLD a per-key pre-agg pass
        // [[resolveSaltBucketsFromPreAgg]]'s result as an explicit bucket
        // count to skip this measurement scan entirely.
        big.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b = resolveSaltBuckets(big, bigKey)
        log.info(
          s"saltedEquiJoin auto: hot-key histogram over '$bigKey' -> " +
            s"$b salt bucket(s)" + (if (b == 1) " (uniform keys: salting skipped)" else ""))
        b
      }
    // Salt MUST be deterministic per row: it is a shuffle/join key, and a
    // nondeterministic source (monotonically_increasing_id, rand) re-assigns
    // salts on fetch-failure recompute or speculative re-execution, silently
    // duplicating/dropping rows vs the plain join. Hash the full row content
    // instead — identical rows share a salt, which is harmless (they carry
    // the same join key anyway), and recomputes are stable.
    // SCALE NOTE: because the salt hashes EVERY input column, column
    // pruning cannot reach below this operator — select only the columns
    // you need BEFORE salting, or the 4×-replicated shuffle carries the
    // full row width (the unpruned q_salted_join gate spilled 51.7 GB at
    // sf100 for a 3-column aggregate; pruned, the salt still spreads hot
    // keys — per-row values differ — and the output set is identical).
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    // Default is sort-merge, NOT hint("shuffle_hash"): the hash shape
    // looks right on paper (the replicated side is the smaller one, and
    // SMJ sorts 60M big-side rows it never needs ordered — 51.7 GB of
    // sort spill at sf100), but Spark's shuffled-hash build map cannot
    // spill, and the r17 A/B measured it OOM-ing ("not enough memory to
    // build hash map") at exactly the 60M-replicated-rows scale that
    // motivated it. SMJ's sorts spill gracefully; a salted join exists
    // for skewed BIG data, so the robust shape wins over the fast-until-
    // it-dies one. `buildHash = "big"` (scaladoc above) is the opt-in
    // for big sides the caller has already bounded per key.
    val buildSide =
      if (buildHash == "big") {
        val statBytes = salted.queryExecution.optimizedPlan.stats.sizeInBytes
        val perPart = statBytes /
          BigInt(math.max(1, shufflePartitions(big.sparkSession)))
        if (perPart <= BigInt(buildBudgetBytes)) salted.hint("shuffle_hash")
        else {
          log.warn(s"saltedEquiJoin buildHash='big': estimated per-partition " +
            s"build bytes $perPart > budget $buildBudgetBytes — the hash " +
            "build map cannot spill; falling back to sort-merge (pass a " +
            "larger buildBudgetBytes for a side measured to fit executor memory)")
          salted
        }
      } else salted
    buildSide.join(replicated,
        buildSide("__salt") === replicated("__salt") &&
          col(bigKey) === col(smallKey))
      .drop("__salt")
  }

  /**
   * Top-`p` fraction filter — the "keep the best X% by score" curation
   * step (quality top-p, perplexity bottom-p via a negated score): the
   * survival threshold is the exact rank-selection quantile at sorted
   * position `ceil((1−p)·n)` (an actual data value, same definition as
   * [[exactPercentiles]] — bit-exact, oracle-comparable), and every row
   * whose score ties the threshold survives, so the cut is deterministic
   * under any tie order.
   *
   * Shape at scale: the threshold comes from [[exactPercentilesHist]]
   * over ONE synthetic group — two hash aggregations plus a window over
   * only the candidate bucket, never a full sort — and then broadcasts
   * as a 1-row literal into a second scan's filter. Two scans total, no
   * corpus shuffle, no driver-side data beyond the histogram.
   */
  def topFraction(df: DataFrame, scoreCol: Column, p: Double,
      bins: Int = 8192): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must lie in (0, 1), got $p")
    val q = 1.0 - p
    val label = s"p${(q * 100).round}"
    val scored = df.withColumn("__score", scoreCol.cast("double"))
    val thr = exactPercentilesHist(
      scored.select(lit(0).as("__g"), col("__score")),
      Seq("__g"), "__score", Seq(q), bins)
      .select(col(label).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("__score") >= col("__thr"))
      .drop("__score", "__thr")
  }
}

/** IEEE-754 sortable bits of a double: an order-preserving map onto the
  * UNSIGNED long line (negatives flip all bits, non-negatives flip the
  * sign bit), so any fixed-width unsigned prefix is an order-preserving
  * bucket with ~2^-mantissaBits relative width inside every binade —
  * the stats-free bucketing [[Relational.exactPercentilesHist]] builds
  * its histogram on. ±0.0 normalizes to +0.0 and all NaNs canonicalize
  * (`doubleToLongBits`), so SQL-equal values can never land in distinct
  * buckets — the in-bucket rank-pick's tie invariant. */
case class DoubleOrderedBits(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    DoubleOrderedBits.bits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.DoubleOrderedBits.bits($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
  override def prettyName: String = "double_ordered_bits"
}

object DoubleOrderedBits {
  def bits(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (v == 0.0) 0.0 else v)
    if (b < 0) ~b else b ^ Long.MinValue
  }
}
