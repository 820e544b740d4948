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
