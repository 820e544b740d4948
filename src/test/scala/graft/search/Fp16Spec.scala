package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.encoders.PassthroughEncoder

/** SQfp16 — train-free IEEE-754 half scalar quantization ([[Fp16]]).
  * The half↔float conversions are self-contained (Java 17 has no
  * `Float.floatToFloat16`), so the kernel tests pin the IEEE behavior
  * bit-for-bit against known values before the e2e searcher paths. */
class Fp16Spec extends SparkSpec {

  test("toHalf: known IEEE binary16 encodings, RNE ties, overflow, subnormals") {
    def h(f: Float): Int = Fp16.toHalf(f) & 0xffff
    // exact representables
    assert(h(0.0f) === 0x0000)
    assert(h(-0.0f) === 0x8000) // signed zero survives
    assert(h(1.0f) === 0x3c00)
    assert(h(-1.0f) === 0xbc00)
    assert(h(0.5f) === 0x3800)
    assert(h(2.0f) === 0x4000)
    assert(h(65504.0f) === 0x7bff) // half's max finite
    // overflow → Inf (65520 is the first float rounding past max-half)
    assert(h(65520.0f) === 0x7c00)
    assert(h(1e9f) === 0x7c00)
    assert(h(-1e9f) === 0xfc00)
    assert(h(Float.PositiveInfinity) === 0x7c00)
    assert(h(Float.NegativeInfinity) === 0xfc00)
    assert((h(Float.NaN) & 0x7e00) === 0x7e00) // quiet NaN
    // round-to-nearest-even at the 2⁻¹¹ tie point above 1.0:
    // 1 + 2⁻¹¹ ties between 0x3c00 and 0x3c01 → even (0x3c00);
    // 1 + 3·2⁻¹¹ ties between 0x3c01 and 0x3c02 → even (0x3c02)
    assert(h(1.0f + math.pow(2, -11).toFloat) === 0x3c00)
    assert(h(1.0f + 3 * math.pow(2, -11).toFloat) === 0x3c02)
    assert(h(1.0f + math.pow(2, -10).toFloat) === 0x3c01) // exact ulp
    // mantissa carry rolls into the exponent: just under 2.0 rounds up
    assert(h(1.9999999f) === 0x4000)
    // subnormal halves: 2⁻²⁴ is the smallest; 2⁻²⁵ ties to even → 0
    assert(h(math.pow(2, -24).toFloat) === 0x0001)
    assert(h(math.pow(2, -25).toFloat) === 0x0000)
    assert(h(3 * math.pow(2, -25).toFloat) === 0x0002) // tie → even (2)
    assert(h(math.pow(2, -26).toFloat) === 0x0000) // below half of smallest
    assert(h(-math.pow(2, -24).toFloat) === 0x8001)
    // largest subnormal (1023·2⁻²⁴) and first normal (2⁻¹⁴)
    assert(h((1023 * math.pow(2, -24)).toFloat) === 0x03ff)
    assert(h(math.pow(2, -14).toFloat) === 0x0400)
  }

  test("fromHalf inverts exactly; toHalf∘fromHalf is identity on all 65536 codes") {
    assert(Fp16.fromHalf(0x3c00.toShort) === 1.0f)
    assert(Fp16.fromHalf(0x3800.toShort) === 0.5f)
    assert(Fp16.fromHalf(0x7bff.toShort) === 65504.0f)
    assert(Fp16.fromHalf(0x0001.toShort) === math.pow(2, -24).toFloat)
    assert(Fp16.fromHalf(0x8000.toShort) === -0.0f)
    assert(Fp16.fromHalf(0x7c00.toShort).isPosInfinity)
    assert(Fp16.fromHalf(0xfc00.toShort).isNegInfinity)
    // every half decodes to a float that re-encodes to itself (round-trip
    // totality — the decode values ARE representable, rounding is a no-op)
    (0 until 0x10000).foreach { bits =>
      val s = bits.toShort
      val f = Fp16.fromHalf(s)
      if (f.isNaN) assert((Fp16.toHalf(f) & 0x7e00) === 0x7e00, f"bits $bits%04x")
      else assert(Fp16.toHalf(f) === s, f"bits $bits%04x -> $f")
    }
  }

  test("toHalf is the NEAREST half for random floats (monotone neighbor check)") {
    val rnd = new scala.util.Random(42)
    (0 until 20000).foreach { _ =>
      // spread across magnitudes incl. the subnormal range
      val f = (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(36) - 18).toFloat
      val code = Fp16.toHalf(f)
      val v = Fp16.fromHalf(code)
      if (!v.isInfinite) {
        val err = math.abs(f.toDouble - v.toDouble)
        // both neighbors must be at least as far (nearest-or-tie)
        val up = Fp16.fromHalf(nextCode(code, +1))
        val dn = Fp16.fromHalf(nextCode(code, -1))
        Seq(up, dn).filterNot(n => n.isNaN || n.isInfinite).foreach { n =>
          assert(math.abs(f.toDouble - n.toDouble) >= err,
            s"$f: chose $v but ${n} is closer")
        }
      }
    }
  }

  /** Neighboring half code in VALUE order (sign-magnitude → step the
    * magnitude away from/toward zero, crossing zero between ±0). */
  private def nextCode(c: Short, dir: Int): Short = {
    val bits = c & 0xffff
    val neg = (bits & 0x8000) != 0
    val mag = bits & 0x7fff
    val step = if (neg) -dir else dir
    val nm = mag + step
    if (nm < 0) (0x0000 | 1).toShort // crossed zero: smallest of other sign... (±0 handled by caller's NaN/Inf filter)
    else if (nm > 0x7fff) c
    else ((if (neg) 0x8000 else 0) | nm).toShort
  }

  test("SQfp16 / IVF8,SQfp16 e2e: codes are 2·dim bytes, near-exact recall, save/load, add") {
    val emb = sf("embeddings")
    val a = emb.filter(col("vec_id") < 400)
    val b = emb.filter(col("vec_id") >= 400)
    val q = emb.filter(col("vec_id") < 5)
    for (param <- Seq("SQfp16", "IVF8,SQfp16")) {
      val model = new SparkSearcher(new PassthroughEncoder("embedding"),
        SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
          measurement = "l2", indexParam = param, nprobe = 8)).fit(a)
      val codeLen = model.indexed.select(length(col("__pq_codes"))).head().getInt(0)
      assert(codeLen === 128, s"param $param: 64 dims must pack to 128 bytes")
      val before = model.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
        .select("vec_id", "rank_no", "sim_item", "sim_val").collect().map(_.toSeq).toSet
      // each query's own vector at rank 0 — fp16 error (≤2⁻¹¹ relative)
      // cannot reorder a self-match on these embeddings
      assert(before.count(s => s(1) == 0 &&
        s(2).toString.toLong == s(0).asInstanceOf[Long]) === 5, s"param $param")
      val dir = java.nio.file.Files.createTempDirectory("graft-fp16").toString
      model.save(dir)
      val loaded = SparkSearcher.load(spark, dir)
      val after = loaded.search(q, 5, keepRankNo = true, queryIdCol = Some("vec_id"))
        .select("vec_id", "rank_no", "sim_item", "sim_val").collect().map(_.toSeq).toSet
      assert(after === before, s"param $param")
      // add() is stateless for fp16 — grown index serves the full space
      val grown = loaded.add(b)
      assert(grown.count === emb.count(), s"param $param")
      val wide = grown.search(emb.filter(col("vec_id") >= 495), 3,
        keepRankNo = true, queryIdCol = Some("vec_id"))
      assert(wide.filter(col("rank_no") === 0 &&
        col("sim_item").cast("long") === col("vec_id")).count() === 5, s"param $param")
      grown.unpersist()
      model.unpersist()
    }
  }

  test("SQfp16 recall@10 vs exact is ~1 (half error barely perturbs cos ranking)") {
    val emb = sf("embeddings")
    val exact = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos")).fit(emb)
    val fp16 = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos", indexParam = "SQfp16")).fit(emb)
    val qs = emb.filter(col("vec_id") < 50)
    def hits(m: SearcherModel) = m.search(qs, 10, keepRankNo = true,
        queryIdCol = Some("vec_id"))
      .select(col("vec_id"), col("sim_item").cast("long"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val he = hits(exact); val hf = hits(fp16)
    val recall = he.keys.toSeq.map(k => hf(k).intersect(he(k)).size.toDouble / 10).sum / he.size
    info(f"SQfp16 recall@10 vs exact: $recall%.3f")
    assert(recall >= 0.95, f"SQfp16 recall@10 $recall%.3f below floor")
    // RFlat over fp16: exact re-rank restores the exact distances
    val refined = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos", indexParam = "SQfp16,RFlat")).fit(emb)
    val hr = hits(refined)
    val rRecall = he.keys.toSeq.map(k => hr(k).intersect(he(k)).size.toDouble / 10).sum / he.size
    info(f"SQfp16,RFlat recall@10 vs exact: $rRecall%.3f")
    assert(rRecall >= recall)
    refined.unpersist(); fp16.unpersist(); exact.unpersist()
  }

  test("SQfp16 range search decodes codes (faiss SQ range_search); byte codes still reject") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") < 5)
    def rangeIds(param: String, nprobe: Int = 16) = {
      val m = new SparkSearcher(new PassthroughEncoder("embedding"),
        SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
          measurement = "cos", indexParam = param, nprobe = nprobe)).fit(emb)
      val r = m.searchRange(q, 0.55, queryIdCol = Some("vec_id"))
        .select(col("vec_id"), col("sim_item").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      m.unpersist(); r
    }
    val exact = rangeIds("Flat")
    val fp16 = rangeIds("SQfp16")
    assert(exact.nonEmpty)
    // fp16 error is ≤2⁻¹¹ relative — at a threshold this far from the
    // decision boundary of these embeddings the sets are expected equal;
    // tolerate a sliver of boundary churn either way
    val sym = (exact diff fp16) ++ (fp16 diff exact)
    assert(sym.size <= math.max(1, exact.size / 50),
      s"fp16 range diverged: ${sym.size} of ${exact.size}")
    // IVF16,SQfp16 at full probe ≡ the flat fp16 scan
    assert(rangeIds("IVF16,SQfp16") === fp16)
    // lossy byte codes still reject — reconstruction would silently
    // change the threshold semantics
    val pq = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos", indexParam = "SQ8")).fit(emb)
    intercept[IllegalArgumentException](pq.searchRange(q, 0.55, Some("vec_id")))
    pq.unpersist()
    // tight-probe regression: fit trained centroids on the NORMALIZED
    // corpus, so range's probing query must normalize the same way —
    // with nprobe=1 each query must still land in its own cell and
    // retrieve itself (raw-magnitude probing picks wrong cells)
    val tight = new SparkSearcher(new PassthroughEncoder("embedding"),
      SearcherParams(itemCol = Some("vec_id"), idCol = Some("vec_id"),
        measurement = "cos", indexParam = "IVF8,SQfp16", nprobe = 1)).fit(emb)
    val selfPairs = tight.searchRange(q, 0.999, queryIdCol = Some("vec_id"))
      .filter(col("sim_item").cast("long") === col("vec_id")).count()
    assert(selfPairs === 5, "nprobe=1 fp16 range lost self matches")
    tight.unpersist()
  }

  test("factory parsing: SQfp16 spellings accepted, other widths raise") {
    assert(IndexStrategy.parse("SQfp16") === SqFlat(16))
    assert(IndexStrategy.parse("IVF16,SQfp16") === IvfSq(16, 16))
    assert(IndexStrategy.parse("IDMap,SQfp16") === SqFlat(16))
    assert(IndexStrategy.parse("SQfp16,RFlat") === Refined(SqFlat(16)))
    intercept[IllegalArgumentException](IndexStrategy.parse("SQ6"))
    intercept[IllegalArgumentException](IndexStrategy.parse("SQfp8"))
    intercept[IllegalArgumentException](IndexStrategy.parse("IVF16,SQ6"))
  }
}
