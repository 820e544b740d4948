package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fitted byte-pair-encoding model: an ordered merge list. Ranks are
 * 1-based (mirroring the oracle's `list_position` lookup) and lower rank
 * wins. The whole model is a few KB — it rides to executors inside the
 * encode UDF's closure, never through a join.
 *
 * Encode semantics (mirrored EXACTLY by the recursive-CTE oracle): start
 * from per-character symbols; repeatedly find the occurrence with the
 * lowest (rank, position) among adjacent symbol pairs present in the
 * merge list and merge THAT single occurrence; stop when no adjacent
 * pair is mergeable. One merge per step keeps the spec trivially
 * order-deterministic on both engines.
 */
case class BpeModel(merges: Vector[(String, String)]) {
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

  // per-task encode memo (the closure deserializes per task, so this is
  // single-threaded): real corpora repeat words constantly — Zipf says
  // most of the stream is the memo's head. Bounded for web-scale vocab.
  @transient private lazy val memo =
    new java.util.HashMap[String, Vector[String]]()
  private val MaxMemo = 1 << 16

  def encodeWord(word: String): Vector[String] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    val out = encodeWordUncached(word)
    if (memo.size < MaxMemo) memo.put(word, out)
    out
  }

  private def encodeWordUncached(word: String): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
        syms.drop(bestI + 2)
    }
    syms
  }

  /** Whitespace-split words, each BPE-encoded, flattened in order. */
  def encodeText(text: String): Seq[String] =
    if (text == null) null
    else text.split(" ").iterator.filter(_.nonEmpty).flatMap(encodeWord).toSeq
}

/**
 * Byte-pair-encoding tokenizer — the real (trainable) sibling of
 * [[TextAnalysis.tokenCountBpeish]]'s regex proxy, and the piece every
 * training-data pipeline runs between curation and packing. The
 * reference's tokenizer lives inside its BERT vocabulary
 * (/root/reference/backend/encoder_utils.py:56, `do_lower_case` wordpiece);
 * this is the from-scratch equivalent: fit learns the merge table from
 * the corpus, encode applies it.
 *
 * Shape at scale: fit is ONE word-count shuffle + a driver loop over a
 * bounded `maxWords` frequency dictionary (the standard BPE trick —
 * merges depend only on the word-frequency histogram, never the corpus
 * order, so the corpus-sized data is touched exactly once); encode is a
 * single stateless scan with the model broadcast in the UDF closure
 * (inherently iterative per word — the documented UDF exception, like
 * the NSW graph walks).
 */
object BpeTokenizer {

  /**
   * Learn `numMerges` merges from the `maxWords` most frequent
   * whitespace tokens (ties on frequency broken by the word string, so
   * the dictionary — and thus the model — is deterministic). Each
   * iteration merges the most frequent adjacent symbol pair (count
   * desc, then pair lexicographic), rewriting dictionary words
   * leftmost-non-overlapping; stops early when no pair occurs twice.
   */
  def fit(df: DataFrame, textCol: String, numMerges: Int = 40,
      maxWords: Int = 4096): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val words = df
      .select(explode(filter(split(col(textCol), " ", -1),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var dict: Array[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var stop = numMerges == 0
    while (!stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = counts.reduceOption { (x, y) =>
        val cmp = java.lang.Long.compare(y._2, x._2) match {
          case 0 => Ordering[(String, String)].compare(x._1, y._1)
          case c => c
        }
        if (cmp <= 0) x else y
      }
      best match {
        case Some(((pa, pb), c)) if c >= 2 =>
          dict = dict.map { case (syms, cnt) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pa && syms(i + 1) == pb) {
                out += (pa + pb); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
          merges += ((pa, pb))
          made += 1
          if (made >= numMerges) stop = true
        case _ => stop = true
      }
    }
    BpeModel(merges.result())
  }

  /** Encode column: BPE token array (null text → null). */
  def encode(text: Column, model: BpeModel): Column = {
    val f = udf((t: String) => model.encodeText(t))
    f(text)
  }

  /** Corpus tokenization: `[<idCol>, n_bpe, bpe_text]` — token count and
    * the space-joined token stream (tokens never contain spaces). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val toks = encode(col(textCol), model)
    df.select(col(idCol), toks.as("__t"))
      .select(col(idCol),
        when(col("__t").isNull, lit(null).cast("long"))
          .otherwise(size(col("__t")).cast("long")).as("n_bpe"),
        array_join(col("__t"), " ").as("bpe_text"))
  }
}
