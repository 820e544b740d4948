package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.encoders.PassthroughEncoder
import graft.search.{SearcherModel, SparkSearcher, SearcherParams}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is an operator from SURVEY.md §2 exercised end to
  * end on the driver's parquet tables; `oracleSql` holds the DuckDB
  * equivalent for the hash-match correctness gate. Numeric discipline for
  * bit-exact oracle parity: vector math in double precision with fixed
  * ascending accumulation order on both sides, money aggregates in DECIMAL
  * (order-independent) cast to double at the end.
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fitted searcher over `<dir>/embeddings.parquet` (the README raw-vector
    * flow, /root/reference/README.md:43-58): item/id = vec_id, vector =
    * embedding, payload = label. */
  private def embSearcher(s: SparkSession, dir: String, measurement: String): SearcherModel = {
    val items = table(s, dir, "embeddings")
    new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = measurement))
      .fit(items)
  }

  /** k-NN over embeddings: first 10 vec_ids as queries against the full
    * table — the engine's flagship top-K similarity join (reference
    * `search`, faiss_searcher.py:161-169). */
  private def knn(s: SparkSession, dir: String, measurement: String, k: Int): DataFrame = {
    val model = embSearcher(s, dir, measurement)
    val queries = table(s, dir, "embeddings").filter(col("vec_id") < 10)
    model.search(queries, k, keepRankNo = true, queryIdCol = Some("vec_id"))
      .select(col("vec_id").as("source_id"), col("rank_no"),
        col("sim_item").cast("long").as("sim_id"),
        col("label").as("sim_label"), col("sim_val"))
      .orderBy("source_id", "rank_no")
  }

  /** DuckDB oracle for `knn`: same double-precision expression tree —
    * dot/(||q||·||x||) per pair, rank by distance with row_id tie-break,
    * final cast to float32 (matches the engine's sim_val contract,
    * faiss_searcher.py:145). */
  private def knnOracle(measurement: String, k: Int): String = {
    val distExpr = measurement match {
      case "cos" => "list_dot_product(q.v, x.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(x.v, x.v)))"
      case "ip"  => "list_dot_product(q.v, x.v)"
      case "l2"  => "list_sum(list_transform(list_zip(q.v, x.v), p -> (p[1]-p[2])*(p[1]-p[2])))"
      case "l1"  => "list_sum(list_transform(list_zip(q.v, x.v), p -> abs(p[1]-p[2])))"
      case "l_inf" => "list_max(list_transform(list_zip(q.v, x.v), p -> abs(p[1]-p[2])))"
    }
    val dir = if (measurement == "cos" || measurement == "ip") "DESC" else "ASC"
    s"""WITH q AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < 10),
       |x AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
       |s AS (SELECT q.vec_id source_id, x.vec_id sim_id, x.label sim_label, $distExpr c
       |      FROM q CROSS JOIN x),
       |r AS (SELECT *, row_number() OVER (PARTITION BY source_id ORDER BY c $dir, sim_id) rn FROM s)
       |SELECT source_id, CAST(rn - 1 AS INT) rank_no, sim_id, sim_label, CAST(c AS FLOAT) sim_val
       |FROM r WHERE rn <= $k ORDER BY source_id, rank_no""".stripMargin.replace("\n", " ")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knn(spark, "/root/testdata/sf0.001", "cos", 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O8+O11: top-K similarity join, per metric (O5)
    "knn_cos_top10" -> ((s, dir) => knn(s, dir, "cos", 10)),
    "knn_ip_top5"   -> ((s, dir) => knn(s, dir, "ip", 5)),
    "knn_l2_top5"   -> ((s, dir) => knn(s, dir, "l2", 5)),
    "knn_l1_top5"   -> ((s, dir) => knn(s, dir, "l1", 5)),
    "knn_linf_top5" -> ((s, dir) => knn(s, dir, "l_inf", 5)),
    // O9: multi-K — one search at max(ks), k=3 derived by rank filter
    "knn_multik_k3" -> ((s, dir) => {
      val model = embSearcher(s, dir, "cos")
      val queries = table(s, dir, "embeddings").filter(col("vec_id") < 10)
      val byK = model.searchMulti(queries, Seq(1, 3, 5), keepRankNo = true,
        queryIdCol = Some("vec_id"))
      byK(3)
        .select(col("vec_id").as("source_id"), col("rank_no"),
          col("sim_item").cast("long").as("sim_id"),
          col("label").as("sim_label"), col("sim_val"))
        .orderBy("source_id", "rank_no")
    }),
    // relational spine: scan → filter → group → aggregate (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(20, 2))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(20, 2))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(24, 4))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_cos_top10" -> knnOracle("cos", 10),
    "knn_ip_top5"   -> knnOracle("ip", 5),
    "knn_l2_top5"   -> knnOracle("l2", 5),
    "knn_l1_top5"   -> knnOracle("l1", 5),
    "knn_linf_top5" -> knnOracle("l_inf", 5),
    "knn_multik_k3" -> knnOracle("cos", 3),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) sum_disc_price,
        | count(*) count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),
  )
}
