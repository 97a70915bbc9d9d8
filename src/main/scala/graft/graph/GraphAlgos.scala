package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.schema.GraphSchema.{DstCol, IdCol, SrcCol}

/** GraphX analytics over a PropertyGraph (SURVEY.md §2 "multi-hop graph
  * traversal at scale" + Phase 4): iterative algorithms — unbounded-depth
  * reachability, connected components, PageRank, triangle counting — run as
  * Pregel supersteps instead of self-join-per-hop Catalyst plans, which is
  * the right engine once depth is unbounded (a k-hop join chain builds k
  * shuffles and an exploding plan; Pregel reuses one partitioning across
  * iterations).
  *
  * Projection contract: string node ids are hashed to VertexId longs
  * (xxhash64-stable); results join back to node DataFrames on the same hash.
  */
object GraphAlgos {

  /** Stable 64-bit vertex id for a string node id (xxhash64; collision
    * probability at 10^9 nodes ≈ 2.7e-2 per birthday bound on 64 bits —
    * production loads with numeric natural keys should project those
    * directly instead).
    */
  private def vid(s: String): VertexId =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L)

  /** Project a PropertyGraph (optionally restricted to some relations) to a
    * GraphX graph. Vertex attr = (label, original id); edge attr = relation
    * name.
    */
  def toGraphX(g: PropertyGraph, relations: Seq[String] = Seq.empty)
      : Graph[(String, String), String] = {
    val spark = g.nodeTables.head._2.sparkSession
    val rels = if (relations.isEmpty) g.schema.relationDefs.map(_.name) else relations
    val vertices = g.nodeTables.toSeq.map { case (label, df) =>
      df.select(col(IdCol)).rdd.map(r => {
        val id = r.getString(0); (vid(id), (label, id))
      })
    }.reduce(_ union _)
    val edges = rels.map { r =>
      g.edgeTables(r).select(col(SrcCol), col(DstCol)).rdd.map(row =>
        Edge(vid(row.getString(0)), vid(row.getString(1)), r))
    }.reduce(_ union _)
    Graph(vertices, edges, defaultVertexAttr = ("", ""),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** All nodes within `depth` hops of `startId` following `relation`
    * (directed) — Pregel BFS; the unbounded-depth generalization of
    * Traversal.related chains (reference: concatMapM getRelated,
    * app/Main.hs:152-156).
    */
  def relatedN(g: PropertyGraph, relation: String, startId: String, depth: Int)
      : DataFrame = {
    val spark = g.nodeTables.head._2.sparkSession
    val ref = g.schema.relation(relation)
    val gx = toGraphX(g, Seq(ref.rel.name))
    val start = vid(startId)
    val reversedRel = ref.reversed
    val init = gx.mapVertices((id, attr) =>
      (attr, if (id == start) 0 else Int.MaxValue))
    val bfs = init.pregel(Int.MaxValue, maxIterations = depth)(
      (_, v, msg) => (v._1, math.min(v._2, msg)),
      triplet => {
        val (fromAttr, toAttr) =
          if (reversedRel) (triplet.dstAttr, triplet.srcAttr)
          else (triplet.srcAttr, triplet.dstAttr)
        val sendTo = if (reversedRel) triplet.srcId else triplet.dstId
        if (fromAttr._2 != Int.MaxValue && fromAttr._2 + 1 < toAttr._2)
          Iterator((sendTo, fromAttr._2 + 1))
        else Iterator.empty
      },
      math.min)
    import spark.implicits._
    bfs.vertices
      .filter { case (_, (_, d)) => d != Int.MaxValue && d > 0 }
      .map { case (_, ((label, id), d)) => (label, id, d) }
      .toDF("label", IdCol, "hops")
  }

  /** Connected components over selected relations; returns (label, id,
    * component) where component is the min VertexId in the component —
    * deterministic given the id hashing.
    */
  def connectedComponents(g: PropertyGraph, relations: Seq[String] = Seq.empty)
      : DataFrame = {
    val spark = g.nodeTables.head._2.sparkSession
    import spark.implicits._
    val gx = toGraphX(g, relations)
    gx.connectedComponents().vertices
      .join(gx.vertices)
      .map { case (_, (comp, (label, id))) => (label, id, comp) }
      .toDF("label", IdCol, "component_vid")
  }

  /** PageRank; returns (label, id, rank). */
  def pageRank(g: PropertyGraph, tol: Double = 1e-4,
      relations: Seq[String] = Seq.empty): DataFrame = {
    val spark = g.nodeTables.head._2.sparkSession
    import spark.implicits._
    val gx = toGraphX(g, relations)
    gx.pageRank(tol).vertices
      .join(gx.vertices)
      .map { case (_, (rank, (label, id))) => (label, id, rank) }
      .toDF("label", IdCol, "rank")
  }

  /** Triangle count per node over an (undirected-ized) relation set. */
  def triangleCount(g: PropertyGraph, relations: Seq[String] = Seq.empty)
      : DataFrame = {
    val spark = g.nodeTables.head._2.sparkSession
    import spark.implicits._
    val gx = toGraphX(g, relations)
      // triangleCount requires canonical orientation + dedup
      .convertToCanonicalEdges()
    gx.triangleCount().vertices
      .join(gx.vertices)
      .map { case (_, (n, (label, id))) => (label, id, n) }
      .toDF("label", IdCol, "triangles")
  }
}
