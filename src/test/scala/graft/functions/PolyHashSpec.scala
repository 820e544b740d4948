package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class PolyHashSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def asciiStrings(n: Int): Seq[String] =
    Seq.fill(n)(Seq.fill(rnd.nextInt(40))((32 + rnd.nextInt(95)).toChar).mkString)
  private def unicodeStrings(n: Int): Seq[String] =
    Seq.fill(n)(Seq.fill(rnd.nextInt(20))(
      Character.toChars(32 + rnd.nextInt(0x2FDF)).mkString).mkString)

  test("hash range is [0, P) and deterministic") {
    asciiStrings(200).foreach { s =>
      val h = PolyHash.hash(s, PolyHash.B1)
      assert(h >= 0L && h < PolyHash.P)
      assert(h === PolyHash.hash(s, PolyHash.B1))
    }
  }

  test("UTF8String byte fast path equals the code-point path on ASCII") {
    asciiStrings(200).foreach { s =>
      assert(PolyHash.hash(UTF8String.fromString(s), PolyHash.B1) ===
        PolyHash.hash(s, PolyHash.B1))
      assert(PolyHash.hash(UTF8String.fromString(s), PolyHash.B2) ===
        PolyHash.hash(s, PolyHash.B2))
    }
  }

  test("UTF8String fallback equals the code-point path on arbitrary unicode") {
    unicodeStrings(200).foreach { s =>
      assert(PolyHash.hash(UTF8String.fromString(s), PolyHash.B1) ===
        PolyHash.hash(s, PolyHash.B1))
    }
  }

  test("newlines are skipped (RE2 `.` convention)") {
    assert(PolyHash.hash("ab\ncd", PolyHash.B1) === PolyHash.hash("abcd", PolyHash.B1))
  }

  test("the fold matches a reference big-integer computation") {
    asciiStrings(100).foreach { s =>
      val expected = s.codePoints().toArray.filter(_ != '\n'.toInt)
        .foldLeft(BigInt(0))((acc, cp) =>
          (acc * PolyHash.B1 + cp) mod BigInt(PolyHash.P))
      assert(BigInt(PolyHash.hash(s, PolyHash.B1)) === expected)
    }
  }
}
