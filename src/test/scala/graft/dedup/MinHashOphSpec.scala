package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import org.apache.spark.sql.graftshim.GraftSql.{column => toCol, expression => toExpr}

/** One-permutation-hashing minhash ([[OphSigKernel]] /
  * [[Dedup.minHashNearDupsOph]]): kernel-vs-reference equivalence,
  * densification invariants, band equivalence on clones, and banded
  * recall against the classic 64-permutation pipeline. */
class MinHashOphSpec extends SparkSpec {

  private val K = 64
  private val N = 5
  private val R = 8              // permutations = rows per band
  private val Bands = K / R
  private val (ca, cb) = Dedup.minHashCoefficients(R)

  /** Straight-line reference of the banded-OPH scheme: string-distinct
    * grams; R independent permuted polyhashes each; multiply-shift range
    * binning into Bands bins per permutation; per-(perm, bin) min at
    * layout `sig[j·R + p]`; circular right rotation densification with
    * d·B1 offset WITHIN each permutation. Independent of the kernel's
    * open-addressing/ASCII machinery. */
  private def refSig(text: String, n: Int, k: Int): (Int, Seq[Long]) = {
    if (text.length < n) return (0, Seq.fill(k)(Long.MaxValue))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 to text.length - n).foreach(i => seen += text.substring(i, i + n))
    val mins = Array.fill(k)(Long.MaxValue)
    seen.foreach { g =>
      val h = PolyHash.hash(g, PolyHash.B1)
      (0 until R).foreach { p =>
        val v = PolyHash.modP(ca(p) * h + cb(p))
        val idx = ((v * Bands) >>> 31).toInt * R + p
        if (v < mins(idx)) mins(idx) = v
      }
    }
    val sig = (0 until k).map { idx =>
      val (j, p) = (idx / R, idx % R)
      if (mins(idx) != Long.MaxValue) mins(idx)
      else {
        var d = 1
        while (mins(((j + d) % Bands) * R + p) == Long.MaxValue) d += 1
        PolyHash.modP(mins(((j + d) % Bands) * R + p) + d.toLong * PolyHash.B1)
      }
    }
    (seen.size, sig)
  }

  private def kernelSig(texts: Seq[String]): Seq[(Int, Seq[Long])] = {
    val sp = spark
    import sp.implicits._
    texts.toDF("text")
      .select(toCol(OphSigExpr(toExpr(col("text")), N, ca, cb, K)).as("st"))
      .select(col("st.sz"), col("st.sig"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
  }

  test("kernel matches the straight-line reference on varied ASCII text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcde",            // exactly one gram: 63 bins densified
      "aaaaaaaaaaaa",     // one distinct gram from many positions
      "ab",               // below gram width: sz = 0
      ("lorem ipsum dolor sit amet " * 20).trim)
    val got = kernelSig(texts)
    texts.zip(got).foreach { case (t, (sz, sig)) =>
      val (rsz, rsig) = refSig(t, N, K)
      assert(sz === rsz, s"sz mismatch for '$t'")
      assert(sig === rsig, s"sig mismatch for '$t'")
    }
  }

  test("non-ASCII text takes the generic path with identical semantics") {
    val texts = Seq("héllo wörld — ünïcode graphemes", "日本語のテキストです、こんにちは")
    val got = kernelSig(texts)
    texts.zip(got).foreach { case (t, (sz, sig)) =>
      val (rsz, rsig) = refSig(t, N, K)
      assert(sz === rsz && sig === rsig, s"generic-path mismatch for '$t'")
    }
  }

  test("densification: any non-empty shingle set yields a sentinel-free, deterministic signature") {
    val texts = Seq("abcde", "vwxyz", "abcdef")
    kernelSig(texts).foreach { case (sz, sig) =>
      assert(sz > 0)
      assert(sig.length === K)
      assert(sig.forall(v => v >= 0 && v < PolyHash.P), "densified values stay in [0, P)")
    }
    assert(kernelSig(texts) === kernelSig(texts))
  }

  test("band equivalence: clones always collide; the pipeline verifies them at jaccard 1.0") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated content about cooking pasta")).toDF("id", "text")
    val pairs = Dedup.minHashNearDupsOph(df, "id", "text", n = N,
      numBins = K, bands = 8, threshold = 0.9).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("banded recall vs the classic 64-permutation pipeline on an edit-heavy clone corpus") {
    val sp = spark
    import sp.implicits._
    // 40 base docs, each with a lightly-edited clone (high jaccard) plus
    // unrelated fillers: a recall fixture where banding has real work
    val rnd = new scala.util.Random(7)
    def sentence(i: Int) = (0 until 30)
      .map(j => s"w${rnd.nextInt(400)}t$i$j").mkString(" ")
    val bases = (0 until 40).map(i => (i.toLong * 2, sentence(i)))
    val clones = bases.map { case (id, t) =>
      (id + 1, t.dropRight(6) + " endx") // small suffix edit
    }
    val fillers = (1000 until 1040).map(i => (i.toLong, sentence(i)))
    val df = (bases ++ clones ++ fillers).toDF("id", "text")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val classic = pairSet(Dedup.minHashNearDups(df, "id", "text",
      n = N, numHashes = 64, bands = 8, threshold = 0.5))
    val oph = pairSet(Dedup.minHashNearDupsOph(df, "id", "text",
      n = N, numBins = K, bands = 8, threshold = 0.5))
    // precision is exact on both (set-Jaccard verify); only candidate
    // recall can differ. Demand OPH recover >= 90% of the classic pairs
    // (both schemes' per-band collision probability is ~J^r).
    assert(classic.nonEmpty)
    val recall = (classic intersect oph).size.toDouble / classic.size
    assert(recall >= 0.9, s"OPH banded recall $recall vs classic (|classic|=${classic.size}, |oph|=${oph.size})")
    // and nothing OPH emits is spurious: every pair must also survive the
    // classic pipeline's own exact verification threshold when re-checked
    val verify = Dedup.jaccardPairs(df, "id", "text", N, 0.5)
    val exact = pairSet(verify)
    assert(oph.subsetOf(exact), "OPH emitted a pair below the exact-jaccard threshold")
  }
}
