package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit => slit, _}
import org.apache.spark.sql.types._

/** Wire-compatible parser for the reference's LQuery JSON expression DSL
  * (reference: native_libs/src/LQuery/AST.cpp:60-163 node forms:
  * `{"column": name}`, int/double/string literals, `{"timestampNs": n}`,
  * `{"operation": op, "arguments": [...]}`,
  * `{"predicate": op, "arguments": [...]}`,
  * `{"boolean": op, "arguments": [...]}`,
  * `{"condition": p, "onTrue": v, "onFalse": v}`).
  *
  * A serialized query from the reference runs unchanged:
  * `LQueryJson.parsePredicate(df, json)` / `parseValue(df, json)` build the
  * same LExpr (with the any-referenced-null guards) the Scala builder
  * produces. Typing mirrors the interpreter's promotion rules over the
  * bound DataFrame's schema: mixed int/double arithmetic promotes to
  * double; `divide` is integer division iff BOTH operands are int64
  * (LQuery/Functions.h:97-121). */
object LQueryJson {

  // ---- minimal JSON (the DSL uses objects, arrays, strings, numbers) ----
  sealed trait J
  case class JObj(fields: Map[String, J]) extends J
  case class JArr(items: List[J]) extends J
  case class JStr(s: String) extends J
  case class JLong(v: Long) extends J
  case class JDouble(v: Double) extends J

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"LQuery JSON parse error at $i: $msg")
    def parse(): J =
      // truncated/malformed wire input surfaces as the documented
      // IllegalArgumentException, never a raw StringIndexOutOfBounds /
      // NumberFormat from an unguarded index or Long.parseLong
      try { ws(); val v = value(); ws(); if (i != s.length) fail("trailing input"); v }
      catch {
        case _: StringIndexOutOfBoundsException => fail("unexpected end of input")
        case e: NumberFormatException => fail(s"bad number: ${e.getMessage}")
      }
    private def value(): J = {
      ws()
      if (i >= s.length) fail("eof")
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case c if c == '-' || c.isDigit => num()
        case _ => fail(s"unexpected '${s(i)}'")
      }
    }
    private def obj(): JObj = {
      i += 1; ws()
      if (s(i) == '}') { i += 1; return JObj(Map.empty) }
      val b = Map.newBuilder[String, J]
      while (true) {
        ws(); val k = str(); ws()
        if (s(i) != ':') fail("expected ':'"); i += 1
        b += k -> value(); ws()
        s(i) match {
          case ',' => i += 1
          case '}' => i += 1; return JObj(b.result())
          case _ => fail("expected ',' or '}'")
        }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      i += 1; ws()
      if (s(i) == ']') { i += 1; return JArr(Nil) }
      val b = List.newBuilder[J]
      while (true) {
        b += value(); ws()
        s(i) match {
          case ',' => i += 1
          case ']' => i += 1; return JArr(b.result())
          case _ => fail("expected ',' or ']'")
        }
      }
      JArr(b.result())
    }
    private def str(): String = {
      if (s(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"' => sb += '"'; case '\\' => sb += '\\'; case '/' => sb += '/'
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => fail(s"bad escape \\$c")
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.result()
    }
    private def num(): J = {
      val start = i
      if (s(i) == '-') i += 1
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) JDouble(t.toDouble)
      else JLong(t.toLong)
    }
  }

  // ---- typed build over the bound DataFrame (rules shared with the
  // Scala builder via LTypes) ----
  import LTypes._

  private def colType(df: DataFrame, name: String): LT = LTypes.colType(df.schema, name)

  private def buildValue(df: DataFrame, j: J): (LExpr, LT) = j match {
    case JLong(v)   => (LQuery.lit(v), TLong)
    case JDouble(v) => (LQuery.lit(v), TDouble)
    case JStr(v)    => (LQuery.lit(v), TString)
    case JObj(f) if f.contains("column") =>
      val name = f("column") match {
        case JStr(n) => n
        case _ => throw new IllegalArgumentException("column name must be a string")
      }
      (LQuery.at(name), colType(df, name))
    case JObj(f) if f.contains("timestampNs") =>
      val ns = f("timestampNs") match {
        case JLong(n) => n
        case JDouble(d) => d.toLong
        case _ => throw new IllegalArgumentException("timestampNs must be a number")
      }
      (LQuery.timestampNs(ns), TTimestamp)
    case JObj(f) if f.contains("operation") =>
      val op = f("operation").asInstanceOf[JStr].s
      val args = f.getOrElse("arguments", JArr(Nil)).asInstanceOf[JArr].items
        .map(buildValue(df, _))
      applyOp(op, args)
    case JObj(f) if f.contains("condition") =>
      val p = buildPredicate(df, f("condition"))
      val (t, tt) = buildValue(df, f("onTrue"))
      val (e, et) = buildValue(df, f("onFalse"))
      val rt = promote(op = "condition", tt, et)
      (LQuery.condition(p, castTo(t, tt, rt), castTo(e, et, rt)), rt)
    case other => throw new IllegalArgumentException(s"LQuery: unexpected value node $other")
  }

  private def promote(op: String, a: LT, b: LT): LT = LTypes.promote(op, a, b)

  private def castTo(e: LExpr, from: LT, to: LT): LExpr =
    if (from == to) e
    else if (from == TLong && to == TDouble) LExpr(e.col.cast(DoubleType), e.refs)
    else throw new IllegalArgumentException(s"LQuery: cannot cast $from to $to")

  private def applyOp(op: String, args: List[(LExpr, LT)]): (LExpr, LT) = (op, args) match {
    case ("plus", List((a, ta), (b, tb)))  => val t = promote(op, ta, tb); (a + b, t)
    case ("minus", List((a, ta), (b, tb))) => val t = promote(op, ta, tb); (a - b, t)
    case ("times", List((a, ta), (b, tb))) => val t = promote(op, ta, tb); (a * b, t)
    case ("divide", List((a, ta), (b, tb))) =>
      val t = promote(op, ta, tb)
      // C++ `/`: integer division iff both int64 (Functions.h:105)
      if (t == TLong) (a.divLong(b), TLong) else (a / b, TDouble)
    case ("mod", List((a, ta), (b, tb))) => val t = promote(op, ta, tb); (a % b, t)
    case ("negate", List((a, ta))) => (-a, promote("times", ta, ta))
    case ("abs", List((a, ta)))    => (a.abs_, promote("times", ta, ta))
    case ("day", List((a, TTimestamp)))   => (LExpr(a.day.col.cast(LongType), a.refs), TLong)
    case ("month", List((a, TTimestamp))) => (LExpr(a.month_.col.cast(LongType), a.refs), TLong)
    case ("year", List((a, TTimestamp)))  => (LExpr(a.year_.col.cast(LongType), a.refs), TLong)
    case _ => throw new IllegalArgumentException(
      s"LQuery: bad operation '$op' over ${args.map(_._2)}")
  }

  private def buildPredicate(df: DataFrame, j: J): LExpr = j match {
    case JObj(f) if f.contains("predicate") =>
      val op = f("predicate").asInstanceOf[JStr].s
      val args = f.getOrElse("arguments", JArr(Nil)).asInstanceOf[JArr].items
      (op, args.map(buildValue(df, _))) match {
        case ("gt", List((a, ta), (b, tb))) => checkOrder(op, ta, tb); a > b
        case ("lt", List((a, ta), (b, tb))) => checkOrder(op, ta, tb); a < b
        case ("eq", List((a, ta), (b, tb))) =>
          // same-type eq only; mixed string/number is an ERROR, not false
          // (reference: Tests.cpp:516-531)
          if (numericOrSame(ta, tb)) a === b
          else throw new IllegalArgumentException(s"LQuery: eq type error $ta vs $tb")
        case ("startsWith", List((a, TString), (b, TString))) =>
          LExpr(a.col.startsWith(b.col), a.refs ++ b.refs)
        case ("matches", List((a, TString), (b, TString))) =>
          LExpr(a.col.rlike_anchor(b.col), a.refs ++ b.refs)
        case other => throw new IllegalArgumentException(s"LQuery: bad predicate $other")
      }
    case JObj(f) if f.contains("boolean") =>
      val op = f("boolean").asInstanceOf[JStr].s
      val args = f.getOrElse("arguments", JArr(Nil)).asInstanceOf[JArr].items
        .map(buildPredicate(df, _))
      (op, args) match {
        case ("and", List(a, b)) => a && b
        case ("or", List(a, b))  => a || b
        case ("not", List(a))    => !a
        case other => throw new IllegalArgumentException(s"LQuery: bad boolean $other")
      }
    case other => throw new IllegalArgumentException(s"LQuery: unexpected predicate node $other")
  }

  private def checkOrder(op: String, a: LT, b: LT): Unit = LTypes.checkOrder(op, a, b)

  private def numericOrSame(a: LT, b: LT): Boolean =
    try { LTypes.checkEq(a, b); true } catch { case _: IllegalArgumentException => false }

  private implicit class AnchoredRlike(c: org.apache.spark.sql.Column) {
    /** Full-string regex match on a (usually literal) pattern column. */
    def rlike_anchor(pattern: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      regexp_like(c, concat(slit("^(?:"), pattern, slit(")$")))
  }

  /** Parse a serialized LQuery VALUE expression against `df`'s schema. */
  def parseValue(df: DataFrame, json: String): LExpr = buildValue(df, new P(json).parse())._1

  /** Parse a serialized LQuery PREDICATE against `df`'s schema. */
  def parsePredicate(df: DataFrame, json: String): LExpr = buildPredicate(df, new P(json).parse())
}
