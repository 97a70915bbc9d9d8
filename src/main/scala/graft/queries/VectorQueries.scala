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

  // Oracle: the same centroid/cosine pipeline in DuckDB list SQL. The
  // element-wise means and the cohesion average accumulate in
  // engine-specific order, but 4dp rounding with the 1e-6 nudge gives
  // ~11 orders of magnitude of margin over the 1-ulp differences
  // (verified cell-identical at sf0.01); ScalaTest keeps the independent
  // centroid bound.
  private val v03Sql =
    """WITH expl AS (
         SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos,
                unnest(CAST(embedding AS DOUBLE[])) AS x
         FROM embeddings),
       cent AS (
         SELECT label, pos, avg(x) AS cx FROM expl GROUP BY label, pos),
       cvec AS (
         SELECT label, list(cx ORDER BY pos) AS centroid FROM cent GROUP BY label),
       scored AS (
         SELECT e.label,
           list_sum(list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]))
           / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x)))
              * sqrt(list_sum(list_transform(c.centroid, x -> x*x)))) AS cos
         FROM embeddings e JOIN cvec c USING (label))
       SELECT label, count(*) AS n_vectors,
              round(avg(cos) + 1e-6, 4) AS avg_cohesion
       FROM scored GROUP BY label"""

  // -------------------------------------------------- LSH approximate top-k
  // Deterministic end-to-end: splitmix-seeded planes, rank tiebreak on
  // corpus_id inside lshTopK. Oracle = precomputed golden output at the
  // driver's gate scale (sf0.01) inlined as VALUES (regression pin);
  // recall@5 vs the exact baseline is asserted in LlmOpsSpec.
  private val v04: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    Ann.lshTopK(emb, queries, "vec_id", "embedding", k = 5,
      planes = 8, tables = 4)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("cosine") + 1e-9, 5).as("cosine"))
  }

  private val v04Sql =
    """SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
              CAST(corpus_id AS BIGINT) AS corpus_id, CAST(cosine AS DOUBLE) AS cosine
       FROM (VALUES
         (0, 1, 99, 0.20414), (0, 2, 461, 0.16836), (0, 3, 297, 0.14202),
         (0, 4, 79, 0.07312), (0, 5, 238, -0.04336),
         (1, 1, 213, 0.22014), (1, 2, 261, 0.20168), (1, 3, 423, 0.18817),
         (1, 4, 235, 0.18591), (1, 5, 201, 0.14259),
         (2, 1, 71, 0.20384), (2, 2, 302, 0.04772), (2, 3, 45, 0.02002),
         (2, 4, 483, -0.05748),
         (3, 1, 283, 0.20418), (3, 2, 111, 0.12915), (3, 3, 295, 0.12285),
         (3, 4, 304, 0.08183), (3, 5, 397, 0.05727),
         (4, 1, 280, 0.27983), (4, 2, 237, 0.21867), (4, 3, 317, 0.19215),
         (4, 4, 181, 0.09522), (4, 5, 297, 0.0905),
         (5, 1, 25, 0.18107), (5, 2, 382, 0.10812), (5, 3, 474, 0.09396),
         (5, 4, 263, 0.06709), (5, 5, 99, 0.03735),
         (6, 1, 350, 0.32452), (6, 2, 22, 0.11749), (6, 3, 479, 0.10518),
         (6, 4, 127, 0.05713), (6, 5, 462, 0.05504),
         (7, 1, 275, 0.14774), (7, 2, 147, 0.12954), (7, 3, 263, 0.0127),
         (7, 4, 44, -0.00907), (7, 5, 432, -0.2016),
         (8, 1, 342, 0.23719), (8, 2, 47, 0.19342), (8, 3, 277, 0.18879),
         (8, 4, 120, 0.10422), (8, 5, 167, 0.07957),
         (9, 1, 414, 0.3323), (9, 2, 386, 0.32212), (9, 3, 438, 0.22238),
         (9, 4, 294, 0.21381), (9, 5, 434, 0.19113))
       AS t(query_id, rank, corpus_id, cosine)"""

  // ------------------------------------------------- embedding near-dup pairs
  // Same determinism argument as v04: golden sf0.01 VALUES oracle.
  private val v05: Q = (s, dir) =>
    Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, planes = 4, tables = 8)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        round(col("cosine") + 1e-9, 5).as("cosine"))

  private val v05Sql =
    """SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
              CAST(cosine AS DOUBLE) AS cosine
       FROM (VALUES
         (7, 340, 0.49277), (16, 402, 0.4463), (19, 87, 0.40324),
         (24, 234, 0.43153), (24, 384, 0.41452), (28, 305, 0.45643),
         (32, 200, 0.43787), (44, 301, 0.45967), (45, 298, 0.45555),
         (53, 234, 0.40052), (53, 300, 0.45297), (53, 430, 0.40786),
         (70, 210, 0.40651), (75, 256, 0.45631), (83, 310, 0.40244),
         (84, 190, 0.41243), (85, 404, 0.43927), (108, 142, 0.43716),
         (120, 421, 0.41044), (131, 456, 0.43215), (150, 152, 0.41825),
         (156, 438, 0.4749), (158, 452, 0.47196), (159, 202, 0.40314),
         (162, 282, 0.43344), (169, 466, 0.51284), (172, 440, 0.43149),
         (181, 194, 0.40839), (183, 399, 0.40326), (191, 431, 0.44206),
         (195, 317, 0.44945), (197, 318, 0.44786), (198, 468, 0.42923),
         (200, 204, 0.44295), (202, 245, 0.40996), (205, 485, 0.40742),
         (207, 326, 0.41677), (234, 384, 0.44482), (238, 287, 0.45157),
         (253, 385, 0.40456), (262, 291, 0.41743), (269, 340, 0.43385),
         (290, 325, 0.45875), (334, 382, 0.42968), (334, 438, 0.40357),
         (335, 439, 0.44257), (338, 406, 0.48266), (350, 395, 0.40709),
         (350, 479, 0.44292))
       AS t(vec_a, vec_b, cosine)"""

  // ---------------------------------------------------- IVF approximate top-k
  // The inverted-file scale path (SURVEY.md §2.4): Voronoi cells over
  // deterministic centroids, nProbe cells scanned per query. Oracle =
  // golden sf0.01 VALUES (same determinism argument as v04: no RNG,
  // corpus_id rank tiebreak).
  private val v06: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    Ann.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
      nCentroids = 16, nProbe = 4)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("cosine") + 1e-9, 5).as("cosine"))
  }

  val queries: Map[String, Q] = Map(
    "v01_vector_stats" -> v01,
    "v02_cosine_topk" -> v02,
    "v03_label_cohesion" -> v03,
    "v04_ann_lsh_topk" -> v04,
    "v05_embedding_neardup" -> v05,
    "v06_ivf_topk" -> v06)

  private val v06Sql =
    """SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
              CAST(corpus_id AS BIGINT) AS corpus_id, CAST(cosine AS DOUBLE) AS cosine
       FROM (VALUES
         (0, 1, 365, 0.36999), (0, 2, 334, 0.36272), (0, 3, 387, 0.33114),
         (0, 4, 423, 0.29693), (0, 5, 73, 0.29543),
         (1, 1, 386, 0.37148), (1, 2, 27, 0.34821), (1, 3, 407, 0.32701),
         (1, 4, 195, 0.32274), (1, 5, 64, 0.31637),
         (2, 1, 117, 0.31814), (2, 2, 450, 0.26634), (2, 3, 188, 0.26327),
         (2, 4, 418, 0.25403), (2, 5, 471, 0.24719),
         (3, 1, 130, 0.39987), (3, 2, 149, 0.32993), (3, 3, 343, 0.30847),
         (3, 4, 174, 0.30355), (3, 5, 231, 0.29879),
         (4, 1, 114, 0.39851), (4, 2, 496, 0.34121), (4, 3, 408, 0.32275),
         (4, 4, 482, 0.3139), (4, 5, 280, 0.27983),
         (5, 1, 404, 0.3284), (5, 2, 419, 0.31924), (5, 3, 157, 0.31126),
         (5, 4, 33, 0.31099), (5, 5, 359, 0.30582),
         (6, 1, 350, 0.32452), (6, 2, 430, 0.32252), (6, 3, 145, 0.2977),
         (6, 4, 437, 0.28303), (6, 5, 268, 0.25994),
         (7, 1, 340, 0.49277), (7, 2, 425, 0.40752), (7, 3, 209, 0.39446),
         (7, 4, 334, 0.3569), (7, 5, 381, 0.34518),
         (8, 1, 39, 0.3847), (8, 2, 138, 0.35667), (8, 3, 403, 0.33824),
         (8, 4, 497, 0.3178), (8, 5, 380, 0.30453),
         (9, 1, 49, 0.38517), (9, 2, 489, 0.34354), (9, 3, 414, 0.3323),
         (9, 4, 107, 0.28449), (9, 5, 256, 0.28447))
       AS t(query_id, rank, corpus_id, cosine)"""

  val oracles: Map[String, String] = Map(
    "v01_vector_stats" -> v01Sql,
    "v02_cosine_topk" -> v02Sql,
    "v03_label_cohesion" -> v03Sql,
    "v04_ann_lsh_topk" -> v04Sql,
    "v05_embedding_neardup" -> v05Sql,
    "v06_ivf_topk" -> v06Sql)
}
