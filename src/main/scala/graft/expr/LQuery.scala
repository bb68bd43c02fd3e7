package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

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
  *
  * Each node also carries the reference's TYPE rule as a deferred
  * `StructType => LT` check (the builder can't know a column's type until a
  * table is bound): string `gt/lt` and mixed string/number `eq` are ERRORS
  * like the reference's builder (Tests.cpp:516-531), raised eagerly for
  * literal-only expressions and at bind time ([[validate]], or the
  * Table.filter/each LExpr overloads) otherwise. Nodes built by the JSON
  * parser arrive pre-checked (typer absent).
  */
final case class LExpr(col: Column, refs: Set[String],
    typer: Option[StructType => LTypes.LT] = None) {
  import LTypes._

  /** Compose a binary node: the type rule runs only when both operand
    * rules are known; literal-only results check immediately. */
  private def bin(o: LExpr)(f: (Column, Column) => Column)(
      rule: (LT, LT) => LT): LExpr =
    LExpr(f(col, o.col), refs ++ o.refs,
      eager(refs ++ o.refs, for (ta <- typer; tb <- o.typer)
        yield (s: StructType) => rule(ta(s), tb(s))))

  private def un(f: Column => Column)(rule: LT => LT): LExpr =
    LExpr(f(col), refs, eager(refs, typer.map(t => (s: StructType) => rule(t(s)))))

  /** Literal-only subtrees (no column refs) can and do type-check at
    * construction, matching the reference's build-time errors. */
  private def eager(allRefs: Set[String],
      t: Option[StructType => LT]): Option[StructType => LT] = {
    if (allRefs.isEmpty) t.foreach(_(StructType(Nil)))
    t
  }

  /** Run the type rules against a bound schema; throws on the reference's
    * builder errors (string order comparison, mixed-type eq, ...). */
  def validate(schema: StructType): LExpr = { typer.foreach(_(schema)); this }

  // arithmetic (reference: LQuery/Functions.h:97-156)
  def +(o: LExpr): LExpr = bin(o)(_ + _)(promote("plus", _, _))
  def -(o: LExpr): LExpr = bin(o)(_ - _)(promote("minus", _, _))
  def *(o: LExpr): LExpr = bin(o)(_ * _)(promote("times", _, _))
  /** Spark double division — typed TDouble accordingly. The reference's
    * `/` on two int64s is INTEGER division (LQuery/Functions.h:105):
    * express that with [[divLong]] (the JSON wire path selects it
    * automatically for long÷long, so serialized reference queries are
    * exact either way). */
  def /(o: LExpr): LExpr = bin(o)(_ / _) { (ta, tb) =>
    promote("divide", ta, tb); TDouble
  }
  def divLong(o: LExpr): LExpr = bin(o) { (a, b) =>
    // exact int64 division (truncation toward zero, like C++), null on /0
    // — try_divide would detour through double and corrupt |q| > 2^53
    org.apache.spark.sql.graftx.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftx.Bridge.expression(a.cast(LongType)),
        org.apache.spark.sql.graftx.Bridge.expression(b.cast(LongType)),
        // LEGACY = null on /0 directly; TRY would still throw in eval and
        // need a TryEval wrapper on top
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
  } { (ta, tb) => requireNumeric("divide", ta, tb); TLong }
  /** `%` keeps the dividend's sign for both int64 and double — same as
    * Spark `%` (NOT pmod). Reference: LQuery/Functions.h:106-121. */
  def %(o: LExpr): LExpr = bin(o)(_ % _)(promote("mod", _, _))
  def unary_- : LExpr = un(negate)(t => promote("times", t, t))
  def abs_ : LExpr = un(abs)(t => promote("times", t, t))

  // timestamp fields (reference: LQuery/Functions.h:158-193)
  def day: LExpr = un(dayofmonth)(t => { requireTimestamp("day", t); TLong })
  def month_ : LExpr = un(month)(t => { requireTimestamp("month", t); TLong })
  def year_ : LExpr = un(year)(t => { requireTimestamp("year", t); TLong })

  // predicates (reference: LQuery/Functions.h:64-94)
  def >(o: LExpr): LExpr = bin(o)(_ > _)((a, b) => { checkOrder("gt", a, b); TBool })
  def <(o: LExpr): LExpr = bin(o)(_ < _)((a, b) => { checkOrder("lt", a, b); TBool })
  def ===(o: LExpr): LExpr = bin(o)(_ === _)((a, b) => { checkEq(a, b); TBool })
  def startsWith(prefix: String): LExpr =
    un(_.startsWith(prefix))(t => { requireString("startsWith", t); TBool })
  /** Full-string regex match (`std::regex_match`) — anchor the pattern. */
  def matches(re: String): LExpr =
    un(_.rlike("^(?:" + re + ")$"))(t => { requireString("matches", t); TBool })

  // boolean combinators (reference: LQuery/Functions.h:217-255)
  def &&(o: LExpr): LExpr = bin(o)(_ && _)((a, b) => { requireBool("and", a, b); TBool })
  def ||(o: LExpr): LExpr = bin(o)(_ || _)((a, b) => { requireBool("or", a, b); TBool })
  def unary_! : LExpr = un(!_)(t => { requireBool("not", t); TBool })

  /** Ternary — both branches' column refs count toward the null guard
    * (reference: LQuery/Functions.h:195-215, Interpreter.cpp:252-261). */
  def ifElse(onTrue: LExpr, onFalse: LExpr): LExpr =
    LExpr(when(col, onTrue.col).otherwise(onFalse.col),
      refs ++ onTrue.refs ++ onFalse.refs,
      eager(refs ++ onTrue.refs ++ onFalse.refs,
        for (tp <- typer; tt <- onTrue.typer; tf <- onFalse.typer)
          yield (s: StructType) => {
            requireBool("condition", tp(s))
            promote("condition", tt(s), tf(s))
          }))

  private def guard: Option[Column] =
    refs.toSeq.sorted.map(org.apache.spark.sql.functions.col(_).isNotNull).reduceOption(_ && _)

  /** Filter predicate with the reference's any-referenced-null exclusion. */
  def toFilter: Column = guard.map(_ && col).getOrElse(col)

  /** Map value: null wherever any referenced column is null. */
  def toMap: Column = guard.map(g => when(g, col)).getOrElse(col)
}

object LQuery {
  import LTypes._

  /** `{"column": name}` — type resolved when a table schema is bound. */
  def at(name: String): LExpr =
    LExpr(col(name), Set(name), Some((s: StructType) => colType(s, name)))

  def lit(v: Any): LExpr = {
    val t: Option[LT] = v match {
      case _: Long | _: Int | _: Short | _: Byte => Some(TLong)
      case _: Double | _: Float => Some(TDouble)
      case _: String => Some(TString)
      case _: Boolean => Some(TBool)
      case _ => None
    }
    LExpr(org.apache.spark.sql.functions.lit(v), Set.empty, t.map(tt => (_: StructType) => tt))
  }

  def timestampNs(ns: Long): LExpr =
    LExpr(timestamp_micros(org.apache.spark.sql.functions.lit(ns / 1000L)), Set.empty,
      Some((_: StructType) => TTimestamp))

  def condition(p: LExpr, onTrue: LExpr, onFalse: LExpr): LExpr = p.ifElse(onTrue, onFalse)
}
