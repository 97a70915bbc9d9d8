package graft.schema

import org.apache.spark.sql.types._

/** Runtime image of the reference's type-level cardinality kind
  * (reference: src/Edgy/Cardinality.hs:16-22). The reference enforces shape
  * at read time ("bad cardinality", src/Edgy/Operations.hs:285-287); we
  * enforce via validation queries (write/validate time) plus read-time
  * asserts in the typed traversal API.
  */
sealed abstract class Cardinality(val name: String) {
  /** Max edges per source node, if bounded. */
  def maxPer: Option[Int] = this match {
    case Cardinality.Optional | Cardinality.One => Some(1)
    case _                                      => None
  }
  /** Min edges per source node. */
  def minPer: Int = this match {
    case Cardinality.One | Cardinality.Some => 1
    case _                                  => 0
  }
}
object Cardinality {
  case object Optional extends Cardinality("Optional")
  case object One      extends Cardinality("One")
  case object Many     extends Cardinality("Many")
  case object Some     extends Cardinality("Some")

  val all: Seq[Cardinality] = Seq(Optional, One, Many, Some)
}

/** Attribute declaration — runtime image of `name ::: t` / `name ::? t`
  * (reference: src/Edgy/Schema.hs:34-36). Optional attributes carry a
  * "mempty" default (reference: src/Edgy/Schema.hs:399-407) restricted to
  * Spark types with natural empties.
  */
final case class AttrDef(
    name: String,
    dataType: DataType,
    required: Boolean = true,
    default: Option[Any] = None) {

  /** The mempty-image default used by optional-attribute reads
    * (reference: src/Edgy/Operations.hs:235-237).
    */
  def defaultValue: Any = default.getOrElse(dataType match {
    case StringType                      => ""
    case LongType                        => 0L
    case IntegerType                     => 0
    case DoubleType                      => 0.0d
    case FloatType                       => 0.0f
    case BooleanType                     => false
    case _: ArrayType                    => Seq.empty
    case _: MapType                      => Map.empty
    case _                               => null
  })

  def field: StructField = StructField(name, dataType, nullable = !required)
}

/** Node-type declaration (reference: src/Edgy/Schema.hs:30-32). Every node
  * table implicitly carries a non-null `id: STRING` column — the runtime
  * image of the UUID identity (reference: src/Edgy/Node.hs:141-145). Ids are
  * caller-assigned (stable under test; `uuid()` in production loads).
  */
final case class NodeDef(label: String, attrs: Seq[AttrDef] = Seq.empty) {
  def attr(name: String): Option[AttrDef] = attrs.find(_.name == name)
  def structType: StructType = structType(StringType)
  def structType(idType: DataType): StructType =
    StructType(StructField(GraphSchema.IdCol, idType, nullable = false) +: attrs.map(_.field))
}

/** Relation declaration — one logical edge set with BOTH direction names
  * (reference: `DefDirected fwd bwd` / `DefSymmetric`,
  * src/Edgy/Schema.hs:73-76). Unlike the reference, which materializes both
  * directions (src/Edgy/Operations.hs:332-334), we store ONE edge table and
  * derive the inverse as a projection — halving storage and making the
  * dual-direction invariant structural instead of maintained.
  */
final case class RelationDef(
    name: String,
    inverse: String,
    from: String,
    to: String,
    card: Cardinality = Cardinality.Many,
    inverseCard: Cardinality = Cardinality.Many,
    symmetric: Boolean = false)

/** A resolved direction of a relation: `reversed = true` means the lookup
  * matched the inverse name, so (src, dst) must be swapped on the stored
  * table.
  */
final case class RelationRef(rel: RelationDef, reversed: Boolean) {
  def srcLabel: String = if (reversed) rel.to else rel.from
  def dstLabel: String = if (reversed) rel.from else rel.to
  def cardinality: Cardinality = if (reversed) rel.inverseCard else rel.card
}

/** Whole-graph schema + startup validation — the runtime image of the
  * reference's compile-time `ValidateSchema` machinery
  * (src/Edgy/Schema.hs:584-585 and the TypeError guards at 124-146, 341-345,
  * 417-427, 568-582). Errors are collected, not thrown, so callers can
  * report all at once.
  *
  * `idType` is the graph-wide node-identity column type: STRING by default
  * (the reference's UUID identities, src/Edgy/Node.hs:141-145), LONG for
  * graphs whose keys are numeric or arithmetically encodable
  * (`key * #labels + labelOrdinal`). Long keys matter at scale: every
  * traversal hop is an equi-join on the id, and long compares beat string
  * compares ~2.5× end-to-end on join-heavy plans (measured, GraphAlgos
  * triangle dictionary + the g01 long-key rewrite), so analytic
  * projections of keyed relational data should prefer LONG and decode to
  * display ids only at the projection edge.
  */
final case class GraphSchema(
    nodeDefs: Seq[NodeDef],
    relationDefs: Seq[RelationDef],
    idType: DataType = StringType) {

  def node(label: String): NodeDef =
    nodeDefs.find(_.label == label).getOrElse(
      throw new IllegalArgumentException(s"unknown node type: $label"))

  def hasNode(label: String): Boolean = nodeDefs.exists(_.label == label)

  /** Resolve a relation by either direction name. Symmetric relations
    * resolve only by their forward name (self-inverse,
    * reference: src/Edgy/Schema.hs:292-307).
    */
  def relation(name: String): RelationRef =
    relationDefs.collectFirst {
      case r if r.name == name                     => RelationRef(r, reversed = false)
      case r if !r.symmetric && r.inverse == name  => RelationRef(r, reversed = true)
    }.getOrElse(throw new IllegalArgumentException(s"unknown relation: $name"))

  /** All relations touching a label, in either role — drives delete-cascade
    * (reference: src/Edgy/Operations.hs:203-217 iterates foldRelations).
    */
  def relationsTouching(label: String): Seq[RelationDef] =
    relationDefs.filter(r => r.from == label || r.to == label)

  /** Mirror of the reference's compile-time checks; run at engine startup. */
  def validate(): Seq[String] = {
    val errors = Seq.newBuilder[String]
    // id type: equality-joinable scalar kinds only
    idType match {
      case StringType | LongType | IntegerType =>
      case other => errors += s"unsupported id type $other (use STRING, LONG or INT)"
    }
    // duplicate node labels
    nodeDefs.groupBy(_.label).collect { case (l, ds) if ds.size > 1 =>
      errors += s"duplicate node type: $l"
    }
    // duplicate attribute names within a node (reference: Schema.hs:124-146)
    for (n <- nodeDefs)
      n.attrs.groupBy(_.name).collect { case (a, ds) if ds.size > 1 =>
        errors += s"duplicate attribute ${n.label}.$a"
      }
    // id is reserved
    for (n <- nodeDefs; a <- n.attrs if a.name == GraphSchema.IdCol)
      errors += s"attribute name 'id' is reserved (${n.label})"
    // relation name uniqueness across both directions
    val names = relationDefs.flatMap(r =>
      if (r.symmetric) Seq(r.name) else Seq(r.name, r.inverse))
    names.groupBy(identity).collect { case (n, ds) if ds.size > 1 =>
      errors += s"duplicate relation name: $n"
    }
    // dangling relation endpoints (reference: Schema.hs:341-345)
    for (r <- relationDefs) {
      if (!hasNode(r.from)) errors += s"relation ${r.name}: unknown node type ${r.from}"
      if (!hasNode(r.to))   errors += s"relation ${r.name}: unknown node type ${r.to}"
      if (r.symmetric && r.from != r.to)
        errors += s"symmetric relation ${r.name} must relate a type to itself"
    }
    // optional attrs must have a representable default: defaultValue is the
    // caller's default or the type's mempty image, and is null exactly for
    // types with no natural empty (e.g. TimestampType, StructType)
    for (n <- nodeDefs; a <- n.attrs if !a.required)
      if (a.defaultValue == null)
        errors += s"optional attribute ${n.label}.${a.name}: no default for ${a.dataType}"
    errors.result()
  }

  /** Throwing form, for engine startup. */
  def validated(): GraphSchema = {
    val errs = validate()
    if (errs.nonEmpty)
      throw new IllegalArgumentException("schema validation failed:\n  " + errs.mkString("\n  "))
    this
  }
}

object GraphSchema {
  val IdCol = "id"
  val SrcCol = "src"
  val DstCol = "dst"
}
