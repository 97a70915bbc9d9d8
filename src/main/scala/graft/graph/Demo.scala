package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema._

/** The reference's demo schema + dataset, rebuilt through the engine API —
  * the golden fixture for graph-operator tests (reference:
  * app/Main.hs:47-75 schema, 79-116 `bigBang`; expectations in
  * repo FIXTURES.md §1). Ids are loader-assigned stable strings so results
  * hash-match across runs (SURVEY.md §7 risk 5).
  */
object DemoGraph {

  val schema: GraphSchema = GraphSchema(
    nodeDefs = Seq(
      NodeDef("Person", Seq(
        AttrDef("name", StringType),
        AttrDef("age", LongType))),
      NodeDef("Activity", Seq(AttrDef("name", StringType))),
      NodeDef("Object", Seq(AttrDef("name", StringType)))),
    relationDefs = Seq(
      RelationDef("spouse", "spouse", "Person", "Person",
        Cardinality.Optional, Cardinality.Optional, symmetric = true),
      RelationDef("friend", "friendOf", "Person", "Person"),
      RelationDef("hobby", "enthusiast", "Person", "Activity"),
      RelationDef("possession", "owner", "Person", "Object"),
      RelationDef("tool", "application", "Activity", "Object")))

  /** Bulk load through the mutation API (reference: `bigBang`,
    * app/Main.hs:79-116 — 9 nodes, 17 edges across 5 relations).
    */
  def bigBang(spark: SparkSession): PropertyGraph = {
    var g = PropertyGraph.empty(spark, schema)
    g = g.addNode("Person", "person:bob", Map("name" -> "Bob", "age" -> 20L))
    g = g.addNode("Person", "person:jane", Map("name" -> "Jane", "age" -> 21L))
    g = g.addNode("Person", "person:jose", Map("name" -> "Jose", "age" -> 22L))
    g = g.addNode("Activity", "activity:poker", Map("name" -> "Poker"))
    g = g.addNode("Activity", "activity:hiking", Map("name" -> "Hiking"))
    g = g.addNode("Object", "object:cards", Map("name" -> "Deck of Cards"))
    g = g.addNode("Object", "object:chips", Map("name" -> "Poker Chips"))
    g = g.addNode("Object", "object:poles", Map("name" -> "Trekking Poles"))
    g = g.addNode("Object", "object:map", Map("name" -> "Trail Map"))
    g = g.addRelated("spouse", "person:bob", "person:jane")
    g = g.addRelated("friend", "person:bob", "person:jane")
    g = g.addRelated("friend", "person:bob", "person:jose")
    g = g.addRelated("friend", "person:jose", "person:bob")
    g = g.addRelated("friend", "person:jane", "person:jose")
    g = g.addRelated("hobby", "person:bob", "activity:poker")
    g = g.addRelated("hobby", "person:bob", "activity:hiking")
    g = g.addRelated("hobby", "person:jane", "activity:poker")
    g = g.addRelated("hobby", "person:jose", "activity:hiking")
    g = g.addRelated("possession", "person:bob", "object:map")
    g = g.addRelated("possession", "person:jane", "object:cards")
    g = g.addRelated("possession", "person:jose", "object:poles")
    g = g.addRelated("tool", "activity:poker", "object:cards")
    g = g.addRelated("tool", "activity:poker", "object:chips")
    g = g.addRelated("tool", "activity:hiking", "object:poles")
    g = g.addRelated("tool", "activity:hiking", "object:map")
    g
  }

  /** Flagship query (reference: `missingTools`, app/Main.hs:148-157):
    * tools needed for a person's hobbies MINUS tools available from self or
    * friends, with MULTISET difference (`\\` removes one occurrence per
    * match) — hence exceptAll, never except.
    */
  def missingTools(g: PropertyGraph, person: String): DataFrame = {
    val id = g.lookupBy("Person", "name", person)
    val p = g.from("Person").filter(col(GraphSchema.IdCol) === id)
    val needed = p.related("hobby").related("tool")
    val own = p.related("possession")
    val friendsHave = p.related("friend").related("possession")
    needed.exceptAll(own.unionAll(friendsHave)).attr("name")
  }
}
