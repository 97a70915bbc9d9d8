package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Laws of the trained BPE tokenizer: greedy application semantics, the
  * Sennrich training fixture, and the distributed-segmentation ≡
  * driver-application equivalence the t39 oracle depends on.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("applyMerge is exhaustive greedy left-to-right") {
    def v(s: String) = s.split("").toVector
    assert(Bpe.applyMerge(v("hello"), "l", "o") ===
      Vector("h", "e", "l", "lo"))
    // overlapping occurrences: "aaa" under (a,a) -> [aa, a], never [a, aa]
    assert(Bpe.applyMerge(v("aaa"), "a", "a") === Vector("aa", "a"))
    assert(Bpe.applyMerge(v("aaaa"), "a", "a") === Vector("aa", "aa"))
    // a merged symbol participates as the LEFT side of later positions
    assert(Bpe.applyMerge(Vector("ab", "c", "ab", "c"), "ab", "c") ===
      Vector("abc", "abc"))
    assert(Bpe.applyMerge(Vector.empty, "a", "b") === Vector.empty)
  }

  test("trainMerges reproduces the classic Sennrich fixture") {
    // the arXiv:1508.07909 example vocabulary: low×5 lower×2 newest×6
    // widest×3 (word-internal variant, no </w>). Most frequent first
    // pairs: (e,s)=9, then (es,t)=9, then (t? ...) — assert the first
    // three merges and that every round's merge has maximal weighted
    // count under the (count desc, pair asc) order.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(words, 4)
    assert(merges.take(3) === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    // 4th round: after est, remaining pair counts: lo+w = 7 — (lo,w) wins
    assert(merges(3) === ("lo", "w"))
  }

  test("training stops early when pairs are exhausted") {
    // single-character words have no adjacent pairs after one merge chain
    val merges = Bpe.trainMerges(Seq(("ab", 3L)), 10)
    assert(merges === Seq(("a", "b"))) // then "ab" is one symbol: no pairs
  }

  test("distributed segment equals driver-side applyMerge, and rebuilds words") {
    val words = Seq("newest", "lowest", "low", "wider", "a", "")
      .toDF("word")
    val merges = Bpe.trainMerges(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 6)
    val seg = Bpe.segment(words, "word", merges)
      .select(col("word"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    for (w <- Seq("newest", "lowest", "low", "wider", "a")) {
      val expected = merges.foldLeft(w.split("").toVector) {
        case (syms, (a, b)) => Bpe.applyMerge(syms, a, b)
      }
      assert(seg(w) === expected, s"word $w diverged")
      // segmentation is a partition of the word: concat restores it
      assert(seg(w).mkString === w)
    }
    assert(seg("") === Vector.empty)
  }
}
