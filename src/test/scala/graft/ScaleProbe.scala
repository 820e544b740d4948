package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, OphSigExpr, ShingleStatsExpr}

/**
 * Scale-decomposition probe (TEST SCOPE — never ships in the library jar):
 * isolates the stages of the minhash-family pipelines so sf100 readings
 * attribute cost to signature kernel vs candidate join vs verify, the way
 * the r12/r13 verdicts asked. Run detached, machine idle:
 *
 *   sbt -batch "Test/runMain graft.ScaleProbe /tmp/graft_sf100 sig"
 *   sbt -batch "Test/runMain graft.ScaleProbe /tmp/graft_sf100 cands"
 *
 * Modes:
 *  - `sig`   — control (text_bm25), then the classic 64-hash and the OPH
 *              signature kernels alone (scan → kernel → noop sink).
 *  - `cands` — banded candidate-set sizes |cands| and distinct candidate
 *              ids for both schemes (count actions; includes the kernel).
 * Output: one JSON line per measurement on stdout.
 */
object ScaleProbe {
  import org.apache.spark.sql.graftshim.GraftSql.{column => toCol, expression => toExpr}

  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"""{"probe":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1) args(1) else "sig"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // footer/listing warmup, mirrors Bench

    // in-run control: zero-shuffle corpus scan (cross-session-valid ratio)
    timed("control_text_bm25") { noop(SparkEntry.queries("text_bm25")(spark, sfDir)) }

    val n = 5
    mode match {
      case "sig" =>
        val (coefA, coefB) = Dedup.minHashCoefficients(64)
        val classic = docs.select(
            toCol(ShingleStatsExpr(toExpr(col("text")), n, coefA, coefB)).as("st"))
          .select(col("st.sz").as("sz"), col("st.sig").as("sig"))
          .filter(col("sz") > 0)
        (1 to 2).foreach(i => timed(s"sig_classic_$i") { noop(classic) })
        val (ca, cb) = Dedup.minHashCoefficients(8)
        val oph = docs.select(
            toCol(OphSigExpr(toExpr(col("text")), n, ca, cb, 64)).as("st"))
          .select(col("st.sz").as("sz"), col("st.sig").as("sig"))
          .filter(col("sz") > 0)
        (1 to 2).foreach(i => timed(s"sig_oph_$i") { noop(oph) })
      case "cands" =>
        def bandCands(sigTab: DataFrame, bands: Int, r: Int): Unit = {
          val banded = sigTab.select(col("id"), posexplode(
              toCol(graft.dedup.BandKeysExpr(toExpr(col("sig")), bands, r)))
              .as(Seq("band", "bh")))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val left = banded.select(col("band"), col("bh"), col("id").as("id_a"))
          val right = banded.select(col("band"), col("bh"), col("id").as("id_b"))
          val c = left.join(right.hint("shuffle_merge"), Seq("band", "bh"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct().count()
          println(s"""{"cands":$c}""")
          banded.unpersist(blocking = false)
        }
        val (coefA, coefB) = Dedup.minHashCoefficients(64)
        val classicTab = docs.select(col("doc_id").as("id"),
            toCol(ShingleStatsExpr(toExpr(col("text")), n, coefA, coefB)).as("st"))
          .select(col("id"), col("st.sz").as("sz"), col("st.sig").as("sig"))
          .filter(col("sz") > 0)
        timed("cands_classic_b8r8") { bandCands(classicTab, 8, 8) }
        val (ca, cb) = Dedup.minHashCoefficients(8)
        val ophTab = docs.select(col("doc_id").as("id"),
            toCol(OphSigExpr(toExpr(col("text")), n, ca, cb, 64)).as("st"))
          .select(col("id"), col("st.sz").as("sz"), col("st.sig").as("sig"))
          .filter(col("sz") > 0)
        timed("cands_oph_b8r8") { bandCands(ophTab, 8, 8) }
      case "cc" =>
        // corpus-dedup stage decomposition: pair generation (checkpointed
        // by the operator, so later stages reuse the blocks), CC, anti-join
        val pairs = timed("cc_pairs_gen") {
          val p = Dedup.minHashNearDups(docs, "doc_id", "text", 5, 64, 8, 0.7)
          println(s"""{"pairs":${p.count()}}""")
          p
        }
        val comp = timed("cc_contract") {
          val c = Dedup.connectedComponents(pairs, "id_a", "id_b")
          println(s"""{"comp_rows":${c.count()}}""")
          c
        }
        timed("cc_antijoin") {
          val drop = comp.filter(!col("is_canonical")).select(col("id"))
          val kept = docs.join(drop, docs("doc_id") === drop("id"), "left_anti")
          noop(kept)
        }
      case "boiler" =>
        // removeBoilerplate stage decomposition over the SAME input the
        // text_boilerplate gate/bench feeds: the 10-token pseudo-line
        // reshape (mirrors SparkEntry.boilerReshaped — raw ScaleGen docs
        // are single-line, so probing them exercises nothing). Stages:
        // reshape scan alone, + line kernel, + persist/two-phase hash-df
        // to the candidate-hash count, full operator, full + the gate's
        // orderBy — each later cost falls out by subtraction.
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val nl = floor((size(toks) + lit(9)) / lit(10)).cast("int")
        val reshaped = docs.select(col("doc_id"),
          when(col("text").isNull, lit(null).cast("string"))
            .when(size(toks) === 0, lit(""))
            .otherwise(array_join(transform(sequence(lit(0), nl - 1),
              i => array_join(slice(toks, i * 10 + 1, lit(10)), " ")), "\n"))
            .as("text"))
        val delimQ = java.util.regex.Pattern.quote("\n")
        val regexPre = reshaped.filter(col("text").isNotNull)
          .select(col("doc_id"),
            posexplode(split(col("text"), delimQ, -1)).as(Seq("pos", "line")))
          .filter(length(col("line")) >= 8)
          .select(col("doc_id"), col("pos"), xxhash64(col("line")).as("lh"))
        // the SHIPPED kernel stream (LineHashKernel byte-scan) vs the
        // regex/String pipeline it replaced — same (doc_id, pos, lh) rows
        val narrowPre = reshaped.filter(col("text").isNotNull)
          .select(col("doc_id"),
            explode(org.apache.spark.sql.graftshim.GraftSql.column(
              graft.dedup.LineHashesExpr(
                org.apache.spark.sql.graftshim.GraftSql.expression(col("text")),
                "\n", 8))).as("__plh"))
          .select(col("doc_id"), col("__plh.pos").as("pos"),
            col("__plh.lh").as("lh"))
        (1 to 2).foreach(i => timed(s"boiler_reshape_$i") { noop(reshaped) })
        (1 to 2).foreach(i => timed(s"boiler_kernel_regex_$i") { noop(regexPre) })
        (1 to 2).foreach(i => timed(s"boiler_kernel_$i") { noop(narrowPre) })
        timed("boiler_to_candhashes") {
          val narrow = narrowPre
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val candHashes = narrow
            .groupBy(col("lh"), col("doc_id")).agg(count(lit(1)).as("__n"))
            .groupBy(col("lh")).agg(count(lit(1)).as("__dfh"))
            .filter(col("__dfh") >= 3)
          println(s"""{"cand_hashes":${candHashes.count()}}""")
          narrow.unpersist(blocking = true)
        }
        (1 to 2).foreach(i => timed(s"boiler_full_$i") {
          noop(Dedup.removeBoilerplate(reshaped, "doc_id", "text",
            minDocs = 3, minLen = 8))
        })
        timed("boiler_full_sorted") {
          noop(Dedup.removeBoilerplate(reshaped, "doc_id", "text",
            minDocs = 3, minLen = 8).orderBy("doc_id"))
        }
      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
