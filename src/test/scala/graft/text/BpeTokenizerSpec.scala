package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BpeTokenizerSpec extends SparkSpec {

  test("fit: learns frequency-ordered merges deterministically") {
    val sp = spark
    import sp.implicits._
    // "ab" appears in every word; "abab" only via two merges
    val docs = Seq((1L, "abab abab abc"), (2L, "abab abx")).toDF("doc_id", "text")
    val m1 = BpeTokenizer.fit(docs, "text", numMerges = 3)
    val m2 = BpeTokenizer.fit(docs, "text", numMerges = 3)
    assert(m1 === m2)                       // refit is bit-identical
    // pair (a,b) dominates: 2 occurrences in each "abab" (×3) + 1 in
    // "abc"/"abx" → first merge must be (a,b)
    assert(m1.merges.head === ("a", "b"))
    // after (a,b): "abab"→[ab,ab] ×3 gives (ab,ab) count 3 → second merge
    assert(m1.merges(1) === ("ab", "ab"))
  }

  test("encode: lowest-(rank, position) single-occurrence merging") {
    val model = BpeModel(Vector(("a", "b"), ("ab", "c")))
    assert(model.encodeWord("abc") === Vector("abc"))    // a|b then ab|c
    assert(model.encodeWord("cab") === Vector("c", "ab"))
    assert(model.encodeWord("xyz") === Vector("x", "y", "z"))
    assert(model.encodeWord("abab") === Vector("ab", "ab"))
    // leftmost occurrence merges first on rank ties
    assert(model.encodeWord("ababc") === Vector("ab", "abc"))
    assert(model.encodeText("abc xyz") === Seq("abc", "x", "y", "z"))
    assert(model.encodeText(null) === null)
  }

  test("tokenize: counts, joined stream, null text preserved") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "abc cab"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val model = BpeModel(Vector(("a", "b"), ("ab", "c")))
    val got = BpeTokenizer.tokenize(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toMap
    assert(got(1L) === ((3L, "abc c ab")))
    assert(got(2L) === ((-1L, null)))
    assert(got(3L) === ((0L, "")))
  }

  test("save/load round-trip: merges order, alphabet, and encodings identical") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq("low lower lowest", "low low newer wider")
      .toDF("text")
    val model = BpeTokenizer.fit(corpus, "text", numMerges = 16, maxWords = 64)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    BpeTokenizer.save(model, dir)
    val back = BpeTokenizer.load(dir)
    assert(back.merges === model.merges)
    assert(back.alphabet === model.alphabet)
    // byte-level OOV fallback survives the round-trip (ü outside alphabet)
    for (w <- Seq("lowest", "newer", "zürich"))
      assert(back.encodeWord(w) === model.encodeWord(w))
    // a model without an alphabet round-trips to None
    val bare = BpeModel(Vector(("a", "b")))
    val dir2 = java.nio.file.Files.createTempDirectory("bpe_model2").toString
    BpeTokenizer.save(bare, dir2)
    assert(BpeTokenizer.load(dir2) === bare)
  }
}
