package graft.graph

import org.apache.spark.sql.{Dataset, Encoders}

import graft.typed._

/** The demo schema through the TYPED facade — the Scala image of the
  * reference app's compile-time-checked usage (`newNode @MySchema
  * @"Person" "Bob" 20`, app/Main.hs:83; schema app/Main.hs:47-75).
  * Attribute access is case-class field access; relation descriptors are
  * typed end-to-end; `spouse`'s Optional cardinality reads back as
  * `Option[Person]`.
  */
object DemoTyped {

  final case class Person(id: String, name: String, age: Long)
  final case class Activity(id: String, name: String)
  final case class Item(id: String, name: String)

  implicit val personT: NodeType[Person]   = NodeType.of[Person]("Person")
  implicit val activityT: NodeType[Activity] = NodeType.of[Activity]("Activity")
  implicit val itemT: NodeType[Item]       = NodeType.of[Item]("Object")

  // one descriptor per schema relation direction in use; cardinalities
  // mirror DemoGraph.schema (spouse Optional, everything else Many)
  val spouse: Rel[Person, Person, Card.Opt]     = Rel("spouse")
  val friend: Rel[Person, Person, Card.Many]    = Rel("friend")
  val hobby: Rel[Person, Activity, Card.Many]   = Rel("hobby")
  val possession: Rel[Person, Item, Card.Many]  = Rel("possession")
  val tool: Rel[Activity, Item, Card.Many]      = Rel("tool")

  /** The flagship query, fully typed (reference app/Main.hs:148-157):
    * every hop's endpoint types are compiler-checked, and the result is a
    * `Dataset[String]` of item names — semantically identical to the
    * untyped [[DemoGraph.missingTools]] (asserted golden in TypedSpec),
    * INCLUDING the lookup contract: exactly-one match by name, erroring
    * on zero and on ambiguous names exactly like the reference's
    * lookupByName (app/Main.hs:137-140) — a name-predicate filter alone
    * would silently merge duplicate-named people instead of refusing.
    */
  def missingTools(g: PropertyGraph, person: String): Dataset[String] = {
    val tg = TypedGraph(g)
    val matches = tg.nodes[Person].where(_.name == person).ds.limit(3).collect()
    val id = matches.length match {
      case 1 => matches.head.id
      case 0 => throw new NoSuchElementException(s"No Person named $person")
      case _ => throw new IllegalStateException(s"Multiple Persons named $person")
    }
    val p = tg.nodes[Person].where(_.id == id)
    val needed = p.related(hobby).related(tool)
    val own = p.related(possession)
    val friendsHave = p.related(friend).related(possession)
    needed.exceptAll(own.unionAll(friendsHave))
      .ds.map(_.name)(Encoders.STRING)
  }
}
