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

  /** `x mod P` for any `x ≥ 0` (including `Long.MaxValue`, the
    * empty-set signature sentinel) without the 64-bit divide.
    *
    * P is Mersenne (2^31 ≡ 1 mod P), so `x = hi·2^31 + lo ≡ hi + lo`:
    * the first fold brings any nonnegative x under 2^33, the second
    * under P + 4, and a single conditional subtract lands in [0, P) —
    * bit-identical to `x % P` on the whole nonnegative range
    * (PolyHashSpec checks edges and a random sweep). The `%` it
    * replaces is a hardware divide (~25 cycles); the minhash
    * signature loop runs it numHashes × distinct-grams times per
    * document, which at the 5M-doc decade made integer division the
    * single largest CPU item in the dedup family's profile. */
  @inline def modP(x: Long): Long = {
    var t = (x & P) + (x >>> 31)
    t = (t & P) + (t >>> 31)
    if (t >= P) t - P else t
  }

  /** `fold cp: acc = (acc·mult + cp) mod P` over the string's code points
    * (newlines skipped). Result in [0, P). */
  def hash(s: String, mult: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp != '\n'.toInt) acc = modP(acc * mult + cp)
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
      if (b != '\n'.toByte) acc = modP(acc * mult + b)
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
