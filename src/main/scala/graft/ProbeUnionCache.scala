package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe (r19, cited by BASELINE.md): scopes WHICH union
  * shapes keep their cache. Findings on Spark 4.1 — A plain union, B
  * typed-part union, C two-children union, D re-union of a persisted
  * union all plan WITH InMemoryTableScans (caches substitute fine);
  * E the same plan as D AFTER unpersisting the grandparent plans with
  * ZERO — `unpersist()` on a parent drops the dependent cache's entry
  * from the manager, the hazard SearcherModel.add()'s r19
  * localCheckpoint hand-off removes; F a PROJECTION-shaped dependent
  * SURVIVES the same parent unpersist (IMTS stay), so the hazard is
  * specific to union-shaped dependents — which is why the fit paths
  * (projection/repartition over `pre`, see [[ProbeFitCache]]) never
  * needed the fix while the add/remove/compact grow chain did. Counts are taken AFTER
  * materialization: AQE's AdaptiveSparkPlanExec hides the final plan
  * from a pre-execution collect (the first version of this probe read
  * zero everywhere for exactly that reason). */
object ProbeUnionCache {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def imts(df: org.apache.spark.sql.DataFrame): Int = {
      df.count() // materialize so AQE finalizes the plan
      "InMemoryTableScan".r.findAllIn(
        df.queryExecution.executedPlan.toString).size
    }
    val p = spark.range(100000L).select(col("id"), (col("id") % 7).as("k"))
      .groupBy("k").agg(sum(col("id")).as("s")).persist()
    p.count()
    // A: plain union over the persisted frame
    val simple = spark.range(5L).select(col("id").as("k"), col("id").as("s"))
    println("A plain-union IMTS: " + imts(p.unionByName(simple)))
    // B: union where the other side has a typed mapPartitions part
    val typed = spark.range(5L).select(col("id").as("k"), col("id").as("s"))
      .as[(Long, Long)].mapPartitions(it => it.map(identity)).toDF("k", "s")
    println("B typed-union IMTS: " + imts(p.unionByName(typed)))
    // C: union of two children of the persisted frame
    println("C child-union IMTS: " + imts(
      p.filter(col("k") < 3).unionByName(p.filter(col("k") >= 3))))
    // D: the grown-frame shape — persisted union re-unioned
    val c1 = p.unionByName(typed).persist(); c1.count()
    val typed2 = spark.range(5L).select(col("id").as("k"), col("id").as("s"))
      .as[(Long, Long)].mapPartitions(it => it.map(identity)).toDF("k", "s")
    println("D grown-union IMTS: " + imts(c1.unionByName(typed2)))
    // E: D but after p.unpersist
    p.unpersist()
    println("E grown-union-after-grandparent-unpersist IMTS: " +
      imts(c1.unionByName(typed2)))
    // F: a PROJECTION-shaped dependent (the fit paths' shape) after its
    // parent unpersists — does it keep its entry where the union lost
    // its? (ProbeFitCache sees the real fit paths survive; this pins
    // the minimal repro of the asymmetry.)
    val p2 = spark.range(100000L).select(col("id"), (col("id") % 7).as("k"))
      .groupBy("k").agg(sum(col("id")).as("s")).persist()
    p2.count()
    val proj = p2.select(col("k"), (col("s") + 1).as("s1")).persist()
    proj.count()
    p2.unpersist()
    println("F projection-after-parent-unpersist IMTS: " +
      imts(proj.filter(col("k") >= 0)))
    spark.stop()
  }
}
