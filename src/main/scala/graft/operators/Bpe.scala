package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — the real trained subword tokenizer (Sennrich,
  * Haddow & Birch 2015, arXiv:1508.07909; word-internal variant, no
  * end-of-word marker), completing t02's "BPE-ish" token statistics with
  * an actual merge-table lifecycle: TRAIN (greedy most-frequent-pair
  * merges over a word-frequency table) then SEGMENT (apply the merge
  * list in training order, each merge greedily left-to-right).
  *
  * Scale shape — the standard industrial decomposition:
  *
  *   - TRAINING runs on the (word, count) FREQUENCY table, never the
  *     corpus: one corpus shuffle builds word counts, then merge
  *     selection is frequency-weighted pair counting over that table.
  *     The training set here is the TOP-N words by count (deterministic
  *     ties: count desc, word asc) — a driver-bounded Seq, the
  *     codebook/ratio-table cost class. The head carries almost all pair
  *     mass under a Zipf law, and N is a knob, not a scale limit.
  *   - SEGMENTATION is vocabulary-proportional, not corpus-proportional:
  *     the DISTINCT words are segmented once (nMerges fold passes over
  *     the word table) and the corpus reaches its per-word token counts
  *     through a broadcast join — the word-level memoization every real
  *     BPE pipeline uses. Nothing token-sequential ever touches corpus
  *     rows.
  *
  * Determinism/oracle: pair stats are integer counts with a total order
  * on ties, and application is a pure left fold — so the whole TRAIN +
  * SEGMENT pipeline replays in DuckDB SQL (unrolled merge rounds, the
  * pqRefinedCtes pattern; `list_reduce` for the greedy fold), making the
  * trained tokenizer itself oracle-checkable.
  */
object Bpe {

  /** Greedy left-to-right application of one merge (a, b) → ab.
    * Implemented as a left fold: merge when the accumulated tail is
    * literally `a` — comparing the POST-merge tail, so "aaa" under
    * (a,a) gives [aa, a], the reference greedy behavior.
    */
  def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  /** Train `nMerges` merges on a driver-bounded (word, count) sample.
    * Each round counts every adjacent symbol pair weighted by word count
    * (overlapping occurrences count, the reference get_stats behavior),
    * merges the most frequent (ties: count desc, then pair lexicographic),
    * and re-segments. Stops early when no pairs remain — applying a
    * shorter merge list is equivalent to padding with never-matching
    * sentinel merges, which is how the SQL replay's fixed unrolling
    * stays aligned.
    */
  def trainMerges(wordCounts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var segs: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.split("").toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var n = 0
    var exhausted = false
    while (n < nMerges && !exhausted) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        stats(p) = stats.getOrElse(p, 0L) + c
      }
      if (stats.isEmpty) exhausted = true
      else {
        val ((a, b), _) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        segs = segs.map { case (syms, c) => (applyMerge(syms, a, b), c) }
        n += 1
      }
    }
    merges.result()
  }

  /** One fold pass of [[applyMerge]] as a Catalyst higher-order-function
    * expression — runs per DISTINCT word (vocabulary-proportional), so
    * the interpreted HOF never sits on a corpus-sized path.
    */
  private def foldMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Segment a word table with a trained merge list: initial
    * per-character symbols, then the merges applied in training order.
    * Adds a `syms` array column.
    */
  def segment(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame =
    // array_remove: split("", "") yields [""], but the empty word's
    // symbol sequence is [] (matching length-series character splits)
    merges.foldLeft(words.withColumn("syms",
        array_remove(split(col(wordCol), ""), ""))) {
      case (df, (a, b)) => df.withColumn("syms", foldMerge(col("syms"), a, b))
    }
}
