package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan-parallelism floor.
  *
  * A columnar scan's task count is its SPLIT count, bounded below by
  * `files.openCostInBytes` (4 MB) and parquet row-group boundaries — a
  * corpus that fits in a handful of row groups runs every narrow stage
  * above the scan on 1-3 tasks regardless of core count. `scanFloor`
  * hash-spreads such an input to `defaultParallelism` when — and only
  * when — its partition count is below it; an input with >= parallelism
  * splits is returned untouched, so no exchange is ever added at cluster
  * scale. The key must make the spread deterministic (never round-robin:
  * retried tasks must reproduce their rows).
  *
  * WHERE IT PAYS (measured, r21 sf0.1): stages whose per-row work dwarfs
  * a row's exchange bytes — large-|Q| distance scans (the searcher fit
  * applies its own copy of this floor) and row-serialization sinks (CSV/
  * JSON writes). WHERE IT DOES NOT: the text-kernel dedup families — an
  * A/B across 22 gates read +6 s with the floor on their cached inputs
  * (the kernels are cheap at small scale while every downstream consumer
  * of the 32-partition cache pays task overhead); those call sites stay
  * at scan partitioning deliberately.
  */
object Parallelism {
  def scanFloor(df: DataFrame, keyCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(keyCol)) else df
  }
}
