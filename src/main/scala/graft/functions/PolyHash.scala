package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling hashes over code points, mod the Mersenne prime
 * 2^31 − 1. The point of this hash (vs xxhash64) is *oracle
 * expressibility*: the exact same fold is one DuckDB `list_reduce` over
 * `regexp_extract_all(s, '.')` code points, so every operator built on it
 * (MinHash signatures, LSH band keys, SimHash fingerprints, the
 * feature-hashing encoder) gets a bit-exact SQL oracle. All intermediate
 * products stay below 2^52 (acc < 2^31, multiplier < 2^21), so both the
 * JVM and DuckDB compute in plain 64-bit integers with no overflow.
 *
 * Code-point convention: '\n' is skipped, mirroring the RE2 `.` used by
 * the oracle side (which never matches a newline).
 */
object PolyHash {
  val P: Long = 2147483647L // 2^31 − 1
  val B1: Long = 1000003L
  val B2: Long = 1572869L

  /** `fold cp: acc = (acc·mult + cp) mod P` over the string's code points
    * (newlines skipped). Result in [0, P). */
  def hash(s: String, mult: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp != '\n'.toInt) acc = (acc * mult + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** UTF8String overload with an ASCII fast path: for pure-ASCII bytes the
    * UTF-8 bytes ARE the code points, so the fold runs straight over the
    * byte buffer with no String allocation (the common case for tokens);
    * any high byte falls back to proper code-point iteration. */
  def hash(s: UTF8String, mult: Long): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return hash(s.toString, mult) // non-ASCII → code-point path
      if (b != '\n'.toByte) acc = (acc * mult + b) % P
      i += 1
    }
    acc
  }

  /** The DuckDB expression computing exactly [[hash]] of `sqlExpr`. */
  def sql(sqlExpr: String, mult: Long): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"regexp_extract_all($sqlExpr, '.'), ch -> ascii(ch)::BIGINT)), " +
      s"(a, c) -> (a * $mult + c) % $P)"
}
