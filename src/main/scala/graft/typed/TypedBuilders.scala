package graft.typed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Expansion-side halves of the [[TypedNodes.whereField]] /
  * [[TypedNodes.groupByField]] macro calls. The macros themselves
  * ([[TypedMacros]], typed-macros subproject — Scala 2 requires macro
  * implementations compiled BEFORE their expansion sites) emit `new
  * FieldPredicateBuilder(...)` / `new GroupedFieldBuilder(...)` trees;
  * these classes live here in the root project because they touch
  * [[TypedNodes]], which the macro project cannot see.
  */

/** Second half of the `whereField(_.age)(_ > 30)` call: holds the bag and
  * the macro-extracted field name, applies the typed predicate as a
  * pushdown-capable `Column` filter.
  */
final class FieldPredicateBuilder[T, F](nodes: TypedNodes[T], fieldName: String) {
  def apply(pred: TypedField[F] => Column): TypedNodes[T] =
    nodes.filter(pred(new TypedField[F](col(fieldName))))
}

/** Second half of `groupByField(_.status).agg(...)`: holds the bag and the
  * macro-extracted key field; `agg` applies the typed aggregates as plain
  * grouped Columns (one hash-partial + one final HashAggregate — no
  * object serialization boundary, unlike `KeyValueGroupedDataset`).
  */
final class GroupedFieldBuilder[T, K](nodes: TypedNodes[T], keyField: String) {
  def agg(first: TypedAgg[T], rest: TypedAgg[T]*): DataFrame =
    nodes.ds.toDF().groupBy(col(keyField))
      .agg(first.column, rest.map(_.column): _*)
}
