package graft.typed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

import scala.reflect.macros.blackbox

/** A case-class field surfaced as a `Column`, with comparison operators
  * typed by the FIELD's type: `whereField(_.age)(_ > 30)` compiles, while
  * `whereField(_.age)(_ > "30")` is a COMPILE error. The produced
  * predicate is a plain Catalyst `Column` on the field NAME, so it stays
  * inside whole-stage codegen and reaches the parquet scan as a pushed
  * filter — closing the fidelity gap between the typed facade and the
  * untyped plans (typed LAMBDA filters deserialize rows; see the
  * [[TypedNodes.where]] scaladoc).
  */
final class TypedField[F](val column: Column) {
  def ===(v: F): Column = column === lit(v)
  def =!=(v: F): Column = column =!= lit(v)
  def >(v: F): Column = column > lit(v)
  def >=(v: F): Column = column >= lit(v)
  def <(v: F): Column = column < lit(v)
  def <=(v: F): Column = column <= lit(v)
  def between(lo: F, hi: F): Column = column.between(lit(lo), lit(hi))
  def isin(vs: F*): Column = column.isin(vs.map(lit(_)): _*)
  def isNull: Column = column.isNull
  def isNotNull: Column = column.isNotNull
}

/** Second half of the `whereField(_.age)(_ > 30)` call: holds the bag and
  * the macro-extracted field name, applies the typed predicate as a
  * pushdown-capable `Column` filter.
  */
final class FieldPredicateBuilder[T, F](nodes: TypedNodes[T], fieldName: String) {
  def apply(pred: TypedField[F] => Column): TypedNodes[T] =
    nodes.filter(pred(new TypedField[F](col(fieldName))))
}

/** Compile-time field-name extraction for [[TypedNodes.whereField]]: the
  * selector must be a simple accessor lambda (`_.age`), whose field name
  * becomes the Column. Anything else — computed expressions, chained
  * access — aborts compilation with an explanation, because a NAME is the
  * one thing a pushed filter needs and a lambda body cannot provide.
  */
object TypedMacros {
  def whereFieldImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree): c.Tree = {
    import c.universe._
    val name = selector match {
      case Function(List(param), Select(Ident(pname), field)) if pname == param.name =>
        field.decodedName.toString
      case _ =>
        c.abort(selector.pos,
          "whereField needs a simple field selector like `_.age` (one parameter, " +
            "one field access) so the field name can become a pushdown-capable Column")
    }
    q"new _root_.graft.typed.FieldPredicateBuilder[${weakTypeOf[T]}, ${weakTypeOf[F]}](${c.prefix}, $name)"
  }
}
