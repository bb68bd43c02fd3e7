package graft.expr

import org.apache.spark.sql.types._

/** The reference LQuery interpreter's little type lattice and its
  * promotion / comparability rules (reference: native_libs/src/LQuery/
  * Functions.h:64-121), shared by the JSON parser (LQueryJson) and the
  * Scala builder (LExpr): the reference ERRORS at query-build time on
  * mixed string/number `eq` and on string `gt/lt`
  * (native_libs/test/Tests.cpp:516-531) — these are builder bugs, not
  * row-level false. */
private[expr] object LTypes {
  sealed trait LT
  case object TLong extends LT
  case object TDouble extends LT
  case object TString extends LT
  case object TTimestamp extends LT
  case object TBool extends LT

  def colType(schema: StructType, name: String): LT = schema(name).dataType match {
    case LongType | IntegerType | ShortType | ByteType => TLong
    case DoubleType | FloatType => TDouble
    case StringType => TString
    case TimestampType | TimestampNTZType => TTimestamp
    case BooleanType => TBool
    case other => throw new IllegalArgumentException(s"LQuery: unsupported column type $other")
  }

  /** Arithmetic promotion mirroring C++ common_type (Functions.h:97-121):
    * both-int64 stays int64, any double -> double; strings/timestamps only
    * for condition branches. */
  def promote(op: String, a: LT, b: LT): LT = (a, b) match {
    case (TLong, TLong)     => TLong
    case (TLong, TDouble) | (TDouble, TLong) | (TDouble, TDouble) => TDouble
    case (TString, TString) if op == "condition" => TString
    case (TTimestamp, TTimestamp) if op == "condition" => TTimestamp
    case _ => throw new IllegalArgumentException(s"LQuery: type error in $op: $a vs $b")
  }

  /** gt/lt: numeric & timestamp ordering; string comparison rejected
    * (reference: Functions.h:64-65). */
  def checkOrder(op: String, a: LT, b: LT): Unit = {
    val ok = (a, b) match {
      case (TString, _) | (_, TString) => false
      case (TTimestamp, TTimestamp) => true
      case (TTimestamp, _) | (_, TTimestamp) => false
      case (TBool, _) | (_, TBool) => false
      case _ => true
    }
    if (!ok) throw new IllegalArgumentException(s"LQuery: $op type error $a vs $b")
  }

  /** eq: same-type or numeric-numeric; mixed string/number is an ERROR,
    * not false (reference: Tests.cpp:516-531). */
  def checkEq(a: LT, b: LT): Unit = {
    val ok = (a, b) match {
      case (TLong | TDouble, TLong | TDouble) => true
      case (x, y) => x == y
    }
    if (!ok) throw new IllegalArgumentException(s"LQuery: eq type error $a vs $b")
  }

  def requireBool(op: String, ts: LT*): Unit =
    ts.find(_ != TBool).foreach(t =>
      throw new IllegalArgumentException(s"LQuery: $op needs boolean operands, got $t"))

  def requireString(op: String, ts: LT*): Unit =
    ts.find(_ != TString).foreach(t =>
      throw new IllegalArgumentException(s"LQuery: $op needs string operands, got $t"))

  def requireTimestamp(op: String, t: LT): Unit =
    if (t != TTimestamp)
      throw new IllegalArgumentException(s"LQuery: $op needs a timestamp operand, got $t")

  def requireNumeric(op: String, ts: LT*): Unit =
    ts.find(t => t != TLong && t != TDouble).foreach(t =>
      throw new IllegalArgumentException(s"LQuery: $op needs numeric operands, got $t"))
}
