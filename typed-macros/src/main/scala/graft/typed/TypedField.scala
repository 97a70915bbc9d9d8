package graft.typed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

import scala.language.experimental.macros
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

/** A typed aggregate over `T`'s fields: a plain Catalyst aggregate
  * `Column` tagged with the SOURCE type, so an aggregate built from one
  * node type cannot be applied to a grouping of another (compile error).
  * Produced only by the [[TypedAggs]] macros — the field name is
  * extracted at compile time and the Column is a codegen'd built-in
  * (`avg(col("age"))`), never a deserializing lambda, so the grouped plan
  * is the same partial-aggregation HashAggregate the untyped API gets.
  */
final class TypedAgg[T](private[typed] val column: Column) {
  /** Rename the output column (default is `<fn>_<field>`). */
  def as(name: String): TypedAgg[T] = new TypedAgg[T](column.as(name))
}

/** Field-name aggregate constructors for [[GroupedFieldBuilder.agg]].
  * `avgOf`/`sumOf` require Numeric evidence on the FIELD type (averaging
  * a String is a compile error); `minOf`/`maxOf` need Ordering.
  */
object TypedAggs {
  def avgOf[T, F](selector: T => F)(implicit num: Numeric[F]): TypedAgg[T] =
    macro TypedMacros.avgOfImpl[T, F]
  def sumOf[T, F](selector: T => F)(implicit num: Numeric[F]): TypedAgg[T] =
    macro TypedMacros.sumOfImpl[T, F]
  def minOf[T, F](selector: T => F)(implicit ord: Ordering[F]): TypedAgg[T] =
    macro TypedMacros.minOfImpl[T, F]
  def maxOf[T, F](selector: T => F)(implicit ord: Ordering[F]): TypedAgg[T] =
    macro TypedMacros.maxOfImpl[T, F]
  def countDistinctOf[T, F](selector: T => F): TypedAgg[T] =
    macro TypedMacros.countDistinctOfImpl[T, F]
  /** `count(*)` over the group, aliased `n`. */
  def countAll[T]: TypedAgg[T] =
    new TypedAgg[T](org.apache.spark.sql.functions.count(lit(1)).as("n"))
}

/** Compile-time field-name extraction for [[TypedNodes.whereField]] /
  * [[TypedNodes.groupByField]] / [[TypedAggs]]: the selector must be a
  * simple accessor lambda (`_.age`), whose field name becomes the Column.
  * Anything else — computed expressions, chained access — aborts
  * compilation with an explanation, because a NAME is the one thing a
  * pushed filter (or a codegen'd aggregate) needs and a lambda body
  * cannot provide.
  */
object TypedMacros {
  private def fieldName(c: blackbox.Context)(selector: c.Tree, what: String): String = {
    import c.universe._
    selector match {
      case Function(List(param), Select(Ident(pname), field)) if pname == param.name =>
        field.decodedName.toString
      case _ =>
        c.abort(selector.pos,
          s"$what needs a simple field selector like `_.age` (one parameter, " +
            "one field access) so the field name can become a Catalyst Column")
    }
  }

  def whereFieldImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree): c.Tree = {
    import c.universe._
    val name = fieldName(c)(selector, "whereField")
    q"new _root_.graft.typed.FieldPredicateBuilder[${weakTypeOf[T]}, ${weakTypeOf[F]}](${c.prefix}, $name)"
  }

  def groupByFieldImpl[T: c.WeakTypeTag, K: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree): c.Tree = {
    import c.universe._
    val name = fieldName(c)(selector, "groupByField")
    q"new _root_.graft.typed.GroupedFieldBuilder[${weakTypeOf[T]}, ${weakTypeOf[K]}](${c.prefix}, $name)"
  }

  private def aggTree(c: blackbox.Context)(fn: String, selector: c.Tree,
      src: c.Type): c.Tree = {
    import c.universe._
    val name = fieldName(c)(selector, s"${fn}Of")
    val fnTerm = TermName(fn)
    val alias = s"${fn}_$name"
    q"""new _root_.graft.typed.TypedAgg[$src](
          _root_.org.apache.spark.sql.functions.$fnTerm(
            _root_.org.apache.spark.sql.functions.col($name)).as($alias))"""
  }

  def avgOfImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree)(num: c.Tree): c.Tree =
    aggTree(c)("avg", selector, c.weakTypeOf[T])
  def sumOfImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree)(num: c.Tree): c.Tree =
    aggTree(c)("sum", selector, c.weakTypeOf[T])
  def minOfImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree)(ord: c.Tree): c.Tree =
    aggTree(c)("min", selector, c.weakTypeOf[T])
  def maxOfImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree)(ord: c.Tree): c.Tree =
    aggTree(c)("max", selector, c.weakTypeOf[T])
  def countDistinctOfImpl[T: c.WeakTypeTag, F: c.WeakTypeTag](c: blackbox.Context)(
      selector: c.Tree): c.Tree = {
    import c.universe._
    val name = fieldName(c)(selector, "countDistinctOf")
    val alias = s"n_distinct_$name"
    q"""new _root_.graft.typed.TypedAgg[${weakTypeOf[T]}](
          _root_.org.apache.spark.sql.functions.count_distinct(
            _root_.org.apache.spark.sql.functions.col($name)).as($alias))"""
  }
}
