package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions._
import graft.similarity.Ann
import Tables.t

/** Similarity-search surface over `embeddings` (SURVEY.md §2.4): vector
  * math via the codegen'd Catalyst expressions, exact brute-force top-k
  * (oracle-backed), and sign-LSH approximate variants (rows-only; recall
  * verified in ScalaTest against the exact baseline).
  *
  * Oracle parity note: DuckDB's list_cosine_similarity computes in float32,
  * so the oracles cast to DOUBLE[] first, and both sides RANK BY THE
  * ROUNDED similarity (5dp + epsilon) with id tiebreaks, so a 1-ulp
  * cross-engine difference cannot reorder the top-k.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------- vector stats
  private val v01: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(vec_norm(col("embedding")) + 1e-9, 5).as("l2_norm"),
        round(vec_dot(col("embedding"), col("embedding")) + 1e-9, 5).as("self_dot"))

  private val v01Sql =
    """SELECT vec_id, label,
       CAST(len(embedding) AS INT) AS dim,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) + 1e-9, 5)
         AS l2_norm,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)) + 1e-9, 5)
         AS self_dot
       FROM embeddings"""

  // ----------------------------------------------- exact cosine top-k (kNN)
  private val v02: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    // over-fetch (k=10), then re-rank by the ROUNDED similarity and cut to 5
    // so both engines order identically even on 5dp ties
    Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("corpus_id"),
        round(col("cosine") + 1e-9, 5).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id"))))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  private val v02Sql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings),
        sims AS (
          SELECT q.query_id, c.corpus_id,
                 round(list_cosine_similarity(c.cv, q.qv) + 1e-9, 5) AS cosine
          FROM c, q WHERE c.corpus_id <> q.query_id),
        ranked AS (
          SELECT query_id, corpus_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, corpus_id) AS rank
          FROM sims)
       SELECT query_id, rank, corpus_id, cosine FROM ranked WHERE rank <= 5"""

  // ------------------------------------------- centroid distance per label
  // Aggregate vector math: per-label centroid (element-wise mean via
  // posexplode → avg → collect back), then each vector's cosine to its own
  // label centroid — the classic "does the labeling cohere" check.
  private val v03: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
    emb.join(broadcast(centroids), "label")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(vec_cosine(col("embedding"), col("centroid"))) + 1e-6, 4)
          .as("avg_cohesion"))
  }

  // No oracle: element-wise mean accumulates in engine-specific order, and
  // the cosine-to-centroid average compounds it; correctness is asserted in
  // ScalaTest against an independently computed centroid.

  // -------------------------------------------------- LSH approximate top-k
  private val v04: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    Ann.lshTopK(emb, queries, "vec_id", "embedding", k = 5,
      planes = 8, tables = 4)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("cosine") + 1e-9, 5).as("cosine"))
  }

  // ------------------------------------------------- embedding near-dup pairs
  private val v05: Q = (s, dir) =>
    Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, planes = 4, tables = 8)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        round(col("cosine") + 1e-9, 5).as("cosine"))

  val queries: Map[String, Q] = Map(
    "v01_vector_stats" -> v01,
    "v02_cosine_topk" -> v02,
    "v03_label_cohesion" -> v03,
    "v04_ann_lsh_topk" -> v04,
    "v05_embedding_neardup" -> v05)

  val oracles: Map[String, String] = Map(
    "v01_vector_stats" -> v01Sql,
    "v02_cosine_topk" -> v02Sql)
}
