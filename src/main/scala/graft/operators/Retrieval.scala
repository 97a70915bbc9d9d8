package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Ranked lexical retrieval (Okapi BM25) and rank fusion — the text half
  * of the hybrid-retrieval shape every production training-data pipeline
  * carries next to its vector index (contamination lookup, hard-negative
  * mining, more-like-this corpus expansion). Formula is the standard
  * public Robertson/Zaragoza BM25 with the non-negative Lucene idf
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`; fusion is plain reciprocal-rank
  * fusion (Cormack et al. 2009), `Σ 1/(c + rank)`.
  *
  * Scale shape (the reason this is an operator and not a query): the
  * corpus text is scanned twice, both times narrowly — once exploding to
  * the `(doc, term)` tf aggregate (the only full-postings shuffle,
  * map-side combined), once for the per-doc length (no shuffle at all:
  * `size(tokens)` is the dl, so avgdl never touches the postings). The
  * query side is small by contract (the v02/v08 broadcast-queries
  * convention), so postings are PRUNED to query terms through a broadcast
  * join before anything else happens — df, the doc-length join, and the
  * scoring aggregate all run over query-vocabulary posting lists, never
  * the corpus vocabulary. The pruned frame is localCheckpointed because
  * two consumers (df and scoring) would otherwise re-tokenize the corpus
  * under divergent column pruning.
  *
  * Determinism contract (the oracle replays everything): scores are
  * ranked ROUNDED (5dp + epsilon) with id tiebreaks, so a 1-ulp
  * cross-engine sum difference cannot reorder the top-k; avgdl is an
  * exact-integer mean (token counts < 2^53) and therefore bit-identical
  * across engines.
  *
  * Reference: cdsmith/edgy has no retrieval surface (its query language
  * is graph traversal, Operations.hs); this is part of the mandated
  * beyond-the-reference LLM-pipeline extension.
  */
object Retrieval {

  /** BM25 top-k: for each query row, the k highest-scoring corpus rows.
    *
    * @param corpus      (idCol, textCol) rows; arbitrarily large
    * @param queries     (idCol, textCol) rows; SMALL — broadcast twice
    * @param excludeSelf drop corpus_id == query_id pairs (more-like-this
    *                    retrieval over a shared id domain)
    * @return (query_id, rank, corpus_id, score) — score rounded to 5dp,
    *         rank dense from 1 by (score desc, corpus_id)
    */
  def bm25TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"BM25 params out of range: k1=$k1 b=$b")

    val tf = corpus
      .select(col(idCol).as("corpus_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("corpus_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // dl without touching the postings: token count == sum of tf
    val docLen = corpus.select(
      col(idCol).as("corpus_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = docLen.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val qTerms = queries.select(
      col(idCol).as("query_id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))

    // prune postings to query vocabulary BEFORE df/dl/scoring; checkpoint
    // because the df branch and the scoring branch prune columns
    // divergently and would defeat exchange reuse (re-tokenizing the
    // corpus twice) — the frame is query-vocabulary-sized, not corpus-sized
    val pruned = tf
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
      .localCheckpoint()

    // df restricted to query terms — identical to the full-vocabulary df
    // on those terms (tf is distinct per (doc, term) by construction)
    val dfq = pruned.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val contrib =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

    val scored = pruned
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .join(docLen, Seq("corpus_id"))
      .crossJoin(broadcast(stats))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(round(sum(contrib) + lit(1e-9), 5).as("score"))

    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("corpus_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("corpus_id"), col("score"))
  }

  /** Reciprocal-rank fusion of two ranked lists sharing
    * (query_id, corpus_id, rank) columns: `Σ 1/(c + rank)` over the lists
    * a candidate appears in (full outer — appearing in one list still
    * scores). Ranks are small integers, so the fused score is
    * bit-identical across engines; rounding to 6dp is the ranking
    * convention, not a tolerance.
    *
    * @return (query_id, rank, corpus_id, rrf, rank_a, rank_b); rank_a/b
    *         null when the candidate missed that list
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1 && c >= 0, s"rrfFuse params out of range: k=$k c=$c")
    val left = a.select(col("query_id"), col("corpus_id"), col("rank").as("rank_a"))
    val right = b.select(col("query_id"), col("corpus_id"), col("rank").as("rank_b"))
    left.join(right, Seq("query_id", "corpus_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("corpus_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("corpus_id"), col("rrf"),
        col("rank_a").cast("int").as("rank_a"),
        col("rank_b").cast("int").as("rank_b"))
  }
}
