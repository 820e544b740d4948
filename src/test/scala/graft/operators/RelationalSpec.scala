package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("asofJoin: latest prior right row per key, inclusive at equal time, null when none") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "rt", "v")
    val res = Relational.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(res.toSeq === Seq(
      (1L, 5L, null),      // before any right row
      (1L, 10L, 100.0),    // equal time matches (inclusive)
      (1L, 20L, 150.0),    // latest of the two priors
      (2L, 10L, null)))    // key with no right rows at all
  }

  test("exactPercentiles: rank-selection values on a known distribution") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Relational.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 0.9, 0.99))
      .head()
    assert(r.getDouble(1) === 50.0) // ceil(0.5*100) = 50
    assert(r.getDouble(2) === 90.0)
    assert(r.getDouble(3) === 99.0) // 0.99*100 rounds to exactly 99.0 in IEEE double
  }

  test("exactPercentilesHist ≡ exactPercentiles: known distribution, ties, degenerate group, real table") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Relational.exactPercentilesHist(df, Seq("g"), "v", Seq(0.5, 0.9, 0.99), bins = 16)
      .head()
    assert(r.getDouble(1) === 50.0 && r.getDouble(2) === 90.0 && r.getDouble(3) === 99.0)
    // heavy ties + an all-equal group (single-bucket degenerate path) +
    // a tiny group: histogram pick must match the window rank selection
    val messy = ((1 to 50).map(i => ("a", (i % 5).toDouble)) ++
      (1 to 30).map(_ => ("b", 7.0)) ++ Seq(("c", 3.0), ("c", 9.0))).toDF("g", "v")
    val want = Relational.exactPercentiles(messy, Seq("g"), "v", Seq(0.25, 0.5, 1.0))
      .orderBy("g").collect()
    val got = Relational.exactPercentilesHist(messy, Seq("g"), "v", Seq(0.25, 0.5, 1.0), bins = 8)
      .orderBy("g").collect()
    assert(got === want)
    // real table, decimal values, multiple groups
    val li = sf("lineitem")
    val w2 = Relational.exactPercentiles(li, Seq("l_returnflag"), "l_extendedprice",
      Seq(0.5, 0.9, 0.99)).orderBy("l_returnflag").collect()
    val g2 = Relational.exactPercentilesHist(li, Seq("l_returnflag"), "l_extendedprice",
      Seq(0.5, 0.9, 0.99)).orderBy("l_returnflag").collect()
    assert(g2 === w2)
    // NULL group key is a group of its own (null-safe joins) and NULL
    // values rank first (bucket 0), matching the window variant on both
    val withNulls = ((1 to 20).map(i => (Some("g"), Some(i.toDouble))) ++
      Seq((None, Some(1.0)), (None, Some(2.0)), (None, Some(3.0)), (None, Some(4.0))) ++
      Seq((Some("g"), None), (Some("g"), None))).toDF("g", "v")
    val wantN = Relational.exactPercentiles(withNulls, Seq("g"), "v", Seq(0.25, 0.75))
      .orderBy("g").collect()
    val gotN = Relational.exactPercentilesHist(withNulls, Seq("g"), "v", Seq(0.25, 0.75), bins = 4)
      .orderBy("g").collect()
    assert(gotN === wantN)
  }

  test("saltedEquiJoin: output equals the plain join") {
    val li = sf("lineitem").select("l_orderkey", "l_extendedprice")
    val o = sf("orders").select("o_orderkey", "o_orderpriority")
    // DECIMAL sum: associative/exact, so the equality check is about the
    // JOIN's output set, not about double-accumulation order (which
    // legitimately differs between the SMJ and shuffled-hash shapes)
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(20, 2))).as("s"))
    val salted = agg(Relational.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey", 8))
    val plain = agg(li.join(o, col("l_orderkey") === col("o_orderkey")))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // buildHash="big": same results through the shuffled-hash shape, and
    // the plan actually IS shuffled-hash with zero sorts below the join
    // (the whole point of the opt-in: drop both SMJ sort passes when the
    // caller has bounded the big side per key)
    val hashed = Relational.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey",
      8, buildHash = "big")
    val hplan = hashed.queryExecution.executedPlan.toString
    assert(hplan.contains("ShuffledHashJoin"), hplan)
    assert(!hplan.contains("SortMergeJoin"), hplan)
    val hagg = agg(hashed)
    assert(hagg.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(hagg).count() === 0)
    intercept[IllegalArgumentException] {
      Relational.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey", 8,
        buildHash = "small")
    }
    // byte-guard (r19): a build side whose estimated per-partition bytes
    // exceed the budget must REFUSE the cannot-spill hash shape and fall
    // back to sort-merge — same results, robust plan. A 1-byte budget
    // trips the guard on any non-empty side, standing in for the
    // genuinely unbounded build map the r17 A/B measured OOMing.
    val guarded = Relational.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey",
      8, buildHash = "big", buildBudgetBytes = 1L)
    // the guard's contract is "never the cannot-spill shuffled-hash shape";
    // what replaces it (SMJ at scale, broadcast at this toy SF) is Spark's
    // pick among the spill-safe shapes
    val gplan = guarded.queryExecution.executedPlan.toString
    assert(!gplan.contains("ShuffledHashJoin"), gplan)
    val gagg = agg(guarded)
    assert(gagg.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(gagg).count() === 0)
  }

  test("resolveSaltBucketsFromPreAgg: buckets from the caller's per-key pre-agg, no extra corpus scan") {
    val sp = spark
    import sp.implicits._
    val p = Relational.shufflePartitions(spark)
    // a per-key pre-agg is one row per key by construction: its hot-key
    // share is 1/N, so buckets = ceil(P/N) — 1 for any N >= P (the skew
    // the counts record was absorbed by the aggregation)
    val preAgg = (1L to 1000L).map(i => (i, if (i == 1L) 500L else 1L))
      .toDF("k", "__cnt")
    assert(Relational.resolveSaltBucketsFromPreAgg(preAgg, "__cnt") === 1)
    // tiny pre-agg (N < P): still defined, spreads its N rows over
    // ceil(P/N) slices, clamped to P
    val tiny = Seq((1L, 10L), (2L, 20L)).toDF("k", "__cnt")
    assert(Relational.resolveSaltBucketsFromPreAgg(tiny, "__cnt") ===
      math.max(1, math.min(p, math.ceil(p / 2.0).toInt)))
    // empty: defined (1), not an NPE
    assert(Relational.resolveSaltBucketsFromPreAgg(
      tiny.filter(col("k") < 0), "__cnt") === 1)
    // the combined gate shape end-to-end: pre-agg'd big side + hash build
    // equals the plain join
    val li = sf("lineitem").select("l_orderkey", "l_extendedprice")
    val o = sf("orders").select("o_orderkey", "o_orderpriority")
    val liAgg = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("__cnt"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(20, 2))).as("__rev"))
      .persist()
    try {
      val b = Relational.resolveSaltBucketsFromPreAgg(liAgg, "__cnt")
      val combined = Relational.saltedEquiJoin(liAgg, o, "l_orderkey",
        "o_orderkey", saltBuckets = b, buildHash = "big")
        .groupBy("o_orderpriority")
        .agg(sum(col("__cnt")).as("n"), sum(col("__rev")).as("rev"))
      val plain = liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("__cnt")).as("n"), sum(col("__rev")).as("rev"))
      assert(combined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(combined).count() === 0)
      // and the shape really is the hash build (the budget admits the
      // bounded one-row-per-key side)
      val cplan = combined.queryExecution.executedPlan.toString
      assert(cplan.contains("ShuffledHashJoin"), cplan)
    } finally liAgg.unpersist()
  }

  test("saltedEquiJoin auto buckets: sized from the measured hot-key share; uniform keys skip salting") {
    val sp = spark
    import sp.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // synthetic hot key: key 0 holds half the rows -> ceil(0.5 * P) slices
    val hot = ((1 to 500).map(_ => (0L, 1.0)) ++
      (1 to 500).map(i => (i.toLong, 1.0))).toDF("k", "v")
    assert(Relational.resolveSaltBuckets(hot, "k") ===
      math.max(1, math.min(p, math.ceil(0.5 * p).toInt)))
    // uniform keys: share ~ 1/n -> 1 bucket, salting becomes a no-op
    val uni = (1L to 1000L).map(i => (i, 1.0)).toDF("k", "v")
    assert(Relational.resolveSaltBuckets(uni, "k") === 1)
    // empty big side: defined (1), not an NPE
    assert(Relational.resolveSaltBuckets(uni.filter(col("k") < 0), "k") === 1)
    // the auto path's OUTPUT equals the plain join either way
    val dim = (0L to 1000L).map(i => (i, s"d$i")).toDF("dk", "name")
    val plain = hot.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"))
    val auto = Relational.saltedEquiJoin(hot, dim, "k", "dk", saltBuckets = 0)
      .groupBy("name").agg(count(lit(1)).as("n"))
    assert(auto.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(auto).count() === 0)
  }

  test("prefixSum: exclusive running sum matches the window formulation, across partitions") {
    val sp = spark
    import sp.implicits._
    // ids deliberately unordered on input; 8 partitions for ~100 rows so
    // the per-partition offset path is genuinely multi-partition
    val df = (1L to 100L).map(i => (i, i % 7)).reverse.toDF("id", "w")
      .repartition(16)
    val got = Relational.prefixSum(df, "id", "w", numPartitions = 8)
      .select("id", "cum_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    (1L to 100L).foreach { i =>
      assert(got(i) === acc, s"cum_before mismatch at id=$i")
      acc += i % 7
    }
  }

  test("packByBudget: contiguous shards, monotone, straddling row stays in earlier shard") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 400L), (2L, 400L), (3L, 400L), (4L, 900L), (5L, 100L))
      .toDF("id", "w")
    val got = Relational.packByBudget(df, "id", "w", budget = 1000L)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cum_before: 0, 400, 800, 1200, 2100 → shards 0,0,0,1,2
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("LSH near-dup: subset of brute force with high recall on close pairs") {
    import graft.dedup.Dedup
    val emb = sf("embeddings")
    val brute = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteClose = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 12 tables pinned: this test certifies the bucketing MACHINERY at a
    // dense operating point; the auto-config policy's own floor is
    // asserted in DedupSpec ("empirical recall on cos>=0.9 pairs")
    val lsh = Dedup.embeddingNearDupsLsh(emb, "vec_id", "embedding", 0.4,
        numTables = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH output must be a subset of brute force")
    if (bruteClose.nonEmpty) {
      val recall = bruteClose.count(lsh.contains).toDouble / bruteClose.size
      assert(recall >= 0.9, s"recall on cos>=0.8 pairs was $recall")
    }
  }

  test("prefixSum frees its arranged cache; release() drops the pinned result") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "w")
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val out = Relational.prefixSum(df, "id", "w", numPartitions = 4)
    assert(out.count() === 1000L)
    // the input-sized arranged cache was freed on return; only the
    // checkpointed result remains pinned
    assert(spark.sparkContext.getPersistentRDDs.size - pinnedBefore <= 1)
    graft.util.CacheDiscipline.release(out)
    assert(spark.sparkContext.getPersistentRDDs.size <= pinnedBefore)
  }

  test("topFraction: rank-selection threshold, threshold ties survive") {
    val sp = spark
    import sp.implicits._
    // scores 1..10: top 30% -> threshold at ceil(0.7*10)=rank 7 -> value 7
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val got = Relational.topFraction(df, col("s"), p = 0.3)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(7L, 8L, 9L, 10L))
    // ties at the threshold all survive: 1,1,2,2,2 with p=0.4 ->
    // threshold value at rank ceil(0.6*5)=3 is 2 -> all three 2s kept
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0), (5L, 2.0))
      .toDF("id", "s")
    val got2 = Relational.topFraction(tied, col("s"), p = 0.4)
      .select("id").as[Long].collect().sorted
    assert(got2.toSeq == Seq(3L, 4L, 5L))
  }
}
