package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the polynomial hash — the shared primitive under MinHash, LSH
  * bands, SimHash, hash-embed and the content split. Two invariants: the
  * ASCII byte fast path must equal the codepoint path bit-for-bit, and
  * every output must stay in [0, P) (a range excursion would corrupt the
  * DuckDB-mirrored arithmetic everywhere at once). */
class PolyHashSpec extends AnyFunSuite {

  test("fuzz: UTF8String ASCII fast path ≡ String codepoint path") {
    val rnd = new scala.util.Random(13)
    val ascii = (' ' to '~').mkString + "\t\n"
    for (trial <- 1 to 500) {
      val s = (0 until rnd.nextInt(50)).map(_ => ascii(rnd.nextInt(ascii.length))).mkString
      for (mult <- Seq(PolyHash.B1, PolyHash.B2)) {
        val fast = PolyHash.hash(UTF8String.fromString(s), mult)
        val slow = PolyHash.hash(s, mult)
        assert(fast === slow, s"trial $trial mult=$mult s=${s.take(20)}…")
        assert(fast >= 0 && fast < PolyHash.P)
      }
    }
  }

  test("fuzz: non-ASCII input routes to the codepoint path, same range") {
    val rnd = new scala.util.Random(17)
    val pool = "aé北 \n🙂" // 1-, 2-, 3-byte and surrogate-pair codepoints
    val cps = pool.codePoints().toArray
    for (trial <- 1 to 300) {
      val s = new String(
        (0 until rnd.nextInt(30)).flatMap(_ =>
          Character.toChars(cps(rnd.nextInt(cps.length)))).toArray)
      for (mult <- Seq(PolyHash.B1, PolyHash.B2)) {
        val h = PolyHash.hash(UTF8String.fromString(s), mult)
        assert(h === PolyHash.hash(s, mult))
        assert(h >= 0 && h < PolyHash.P)
      }
    }
  }

  test("modP ≡ % P on the whole nonnegative range (edges + random sweep)") {
    // every hot kernel loop (minhash signature, simhash votes, band
    // keys, gram polyhash) now reduces via the Mersenne fold — a single
    // value where modP(x) != x % P would silently shift signatures
    // everywhere at once, so sweep edges, near-multiples, and randoms
    val edges = Seq(0L, 1L, PolyHash.P - 1, PolyHash.P, PolyHash.P + 1,
      (1L << 31) - 2, 1L << 31, (1L << 32) - 1, 1L << 32,
      (1L << 52) - 1, 1L << 52, (1L << 62) - 1, 1L << 62,
      Long.MaxValue - 1, Long.MaxValue) ++
      (1L to 8L).flatMap(k => Seq(k * PolyHash.P - 1, k * PolyHash.P, k * PolyHash.P + 1))
    for (x <- edges) assert(PolyHash.modP(x) === x % PolyHash.P, s"x=$x")
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 2000000) {
      val x = rnd.nextLong() & Long.MaxValue // uniform nonnegative
      assert(PolyHash.modP(x) === x % PolyHash.P, s"x=$x")
    }
  }

  test("fuzz: sorted-merge intersect size ≡ Set intersection on random long arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).distinct.sorted
      val got = graft.dedup.IntersectKernels.intersectSize(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(got === a.toSet.intersect(b.toSet).size, s"trial $trial")
    }
  }
}
