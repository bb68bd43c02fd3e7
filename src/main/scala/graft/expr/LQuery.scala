package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** LQuery-equivalent expression builder.
  *
  * The reference's filter/map lambdas compile to a small JSON expression DSL
  * interpreted vectorized in C++ (reference: native_libs/src/LQuery/
  * {AST,Interpreter,Functions}). Here each DSL node is a Catalyst `Column`
  * plus the set of referenced column names, because the reference's null
  * semantics are NOT SQL three-valued logic:
  *
  *   a row is excluded (filter) / null (map) if ANY column referenced
  *   anywhere in the expression is null at that row — even a column only
  *   referenced in the untaken branch of a conditional, even `x OR true`.
  *   (reference: LQuery/Interpreter.cpp:320-338 filter, 419-449 map)
  *
  * So `toFilter` ANDs an `isNotNull` guard per referenced column and `toMap`
  * wraps the value in `when(allRefsNotNull, v)`. Everything stays a pure
  * Catalyst expression tree — whole-stage codegen, no UDFs.
  */
final case class LExpr(col: Column, refs: Set[String]) {
  private def bin(o: LExpr)(f: (Column, Column) => Column) = LExpr(f(col, o.col), refs ++ o.refs)

  // arithmetic (reference: LQuery/Functions.h:97-156)
  def +(o: LExpr): LExpr = bin(o)(_ + _)
  def -(o: LExpr): LExpr = bin(o)(_ - _)
  def *(o: LExpr): LExpr = bin(o)(_ * _)
  /** C++ `/`: integer division when both sides are int64
    * (reference: LQuery/Functions.h:105). Caller picks via `divLong`. */
  def /(o: LExpr): LExpr = bin(o)(_ / _)
  def divLong(o: LExpr): LExpr = bin(o) { (a, b) =>
    try_divide(a.cast(LongType), b.cast(LongType)).cast(LongType)
  }
  /** `%` keeps the dividend's sign for both int64 and double — same as
    * Spark `%` (NOT pmod). Reference: LQuery/Functions.h:106-121. */
  def %(o: LExpr): LExpr = bin(o)(_ % _)
  def unary_- : LExpr = LExpr(negate(col), refs)
  def abs_ : LExpr = LExpr(abs(col), refs)

  // timestamp fields (reference: LQuery/Functions.h:158-193)
  def day: LExpr = LExpr(dayofmonth(col), refs)
  def month_ : LExpr = LExpr(month(col), refs)
  def year_ : LExpr = LExpr(year(col), refs)

  // predicates (reference: LQuery/Functions.h:64-94)
  def >(o: LExpr): LExpr = bin(o)(_ > _)
  def <(o: LExpr): LExpr = bin(o)(_ < _)
  def ===(o: LExpr): LExpr = bin(o)(_ === _)
  def startsWith(prefix: String): LExpr = LExpr(col.startsWith(prefix), refs)
  /** Full-string regex match (`std::regex_match`) — anchor the pattern. */
  def matches(re: String): LExpr = LExpr(col.rlike("^(?:" + re + ")$"), refs)

  // boolean combinators (reference: LQuery/Functions.h:217-255)
  def &&(o: LExpr): LExpr = bin(o)(_ && _)
  def ||(o: LExpr): LExpr = bin(o)(_ || _)
  def unary_! : LExpr = LExpr(!col, refs)

  /** Ternary — both branches' column refs count toward the null guard
    * (reference: LQuery/Functions.h:195-215, Interpreter.cpp:252-261). */
  def ifElse(onTrue: LExpr, onFalse: LExpr): LExpr =
    LExpr(when(col, onTrue.col).otherwise(onFalse.col), refs ++ onTrue.refs ++ onFalse.refs)

  private def guard: Option[Column] =
    refs.toSeq.sorted.map(org.apache.spark.sql.functions.col(_).isNotNull).reduceOption(_ && _)

  /** Filter predicate with the reference's any-referenced-null exclusion. */
  def toFilter: Column = guard.map(_ && col).getOrElse(col)

  /** Map value: null wherever any referenced column is null. */
  def toMap: Column = guard.map(g => when(g, col)).getOrElse(col)
}

object LQuery {
  /** `{"column": name}` */
  def at(name: String): LExpr = LExpr(col(name), Set(name))
  def lit(v: Any): LExpr = LExpr(org.apache.spark.sql.functions.lit(v), Set.empty)
  def timestampNs(ns: Long): LExpr =
    LExpr(timestamp_micros(org.apache.spark.sql.functions.lit(ns / 1000L)), Set.empty)
  def condition(p: LExpr, onTrue: LExpr, onFalse: LExpr): LExpr = p.ifElse(onTrue, onFalse)
}
