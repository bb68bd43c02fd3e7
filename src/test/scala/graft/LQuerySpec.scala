package graft

import graft.core.Table
import graft.expr.LQuery
import org.apache.spark.sql.Row

/** LQuery null semantics — the reference's interpreter excludes (filter) /
  * nulls (map) a row when ANY referenced column is null, even one only
  * referenced in the untaken branch of a conditional and even when SQL
  * three-valued logic would yield TRUE (reference:
  * LQuery/Interpreter.cpp:320-338,419-449; Test.luna:446-457). */
class LQuerySpec extends SparkSpec {
  import LQuery._

  private def df = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "aa"),
      (2L, null, "ab"),
      (3L, 30.0, null),
      (4L, 40.0, "bb"))
      .toDF("a", "b", "s")
  }

  test("filter excludes rows where any referenced column is null") {
    val pred = at("a") > lit(0L) // only references a — no exclusions
    assert(Table.of(df).filter(pred.toFilter).rowCount == 4)

    val pred2 = (at("a") > lit(0L)) || (at("b") > lit(0.0))
    // SQL: true OR null = true would keep row 2; reference drops it
    val kept = Table.of(df).filter(pred2.toFilter).toDF.select("a")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("condition counts refs of BOTH branches toward the null guard") {
    // row 2: b is null but the true-branch (a) would be taken; reference
    // still nulls the result because b is referenced in the untaken branch
    val v = condition(at("a") < lit(3L), at("a") + lit(100L),
      (at("b") * lit(2.0)).toLong)
    val out = Table.of(df).each("r", v.toMap).toDF
      .select("a", "r").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(1L).contains(101L))
    assert(out(2L).isEmpty) // null despite untaken branch
    assert(out(3L).contains(60L))
  }

  test("filter preserves nulls in non-referenced columns") {
    val pred = at("a") > lit(1L)
    val rows = Table.of(df).filter(pred.toFilter).toDF.collect()
    assert(rows.length == 3)
    assert(rows.exists(r => r.isNullAt(1))) // row 2's null b survives
    assert(rows.exists(r => r.isNullAt(2))) // row 3's null s survives
  }

  test("startsWith and full-string matches") {
    val sw = Table.of(df).filter(at("s").startsWith("a").toFilter).rowCount
    assert(sw == 2)
    // matches is anchored full-string like std::regex_match
    val m = Table.of(df).filter(at("s").matches("a.").toFilter).rowCount
    assert(m == 2) // "aa","ab" match; "bb" doesn't; null row excluded
    val partial = Table.of(df).filter(at("s").matches("a").toFilter).rowCount
    assert(partial == 0) // "a" alone does NOT match "aa" (full-string)
  }

  test("integer division and % keep C++ semantics") {
    import spark.implicits._
    val d2 = Seq((7L, 2L), (-7L, 2L), (9L, -2L)).toDF("x", "y")
    val out = Table.of(d2)
      .each("q", at("x").divLong(at("y")).toMap)
      .each("m", (at("x") % at("y")).toMap)
      .toDF.select("x", "q", "m").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(7L) == ((3L, 1L)))
    assert(out(-7L) == ((-3L, -1L))) // trunc toward zero; % keeps dividend sign
    assert(out(9L) == ((-4L, 1L)))   // 9/-2 truncates toward zero
    // exact at 2^53+1 (a double detour truncates to ...992) and null on /0
    val big = Seq((9007199254740993L, 1L), (5L, 0L)).toDF("x", "y")
    val bigOut = Table.of(big)
      .each("q", at("x").divLong(at("y")).toMap)
      .toDF.select("x", "q").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(bigOut(9007199254740993L) == 9007199254740993L)
    assert(bigOut(5L) == null)
  }

  test("mixed-type comparisons error rather than comparing as false") {
    // reference: comparisons on mixed string/number are errors, not false
    // (Tests.cpp:516-531). Spark ANSI raises too — at analysis time when
    // no implicit cast exists, else as a runtime cast error.
    val bad = at("s") > at("a")
    val thrown = intercept[Throwable] {
      Table.of(df).filter(bad.toFilter).toDF.collect()
    }
    assert(thrown.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      thrown.getClass.getName.startsWith("org.apache.spark.Spark"))
  }

  test("builder type rules: string gt/lt and mixed eq throw at bind time") {
    import spark.implicits._
    val d = Seq((1L, "x", 2.5)).toDF("n", "s", "d")
    // mixed string/number eq is a BUILDER error (Tests.cpp:516-531)
    val e1 = intercept[IllegalArgumentException] {
      Table.of(d).filter(at("s") === lit(1L))
    }
    assert(e1.getMessage.contains("eq type error"))
    // string ordering comparison is rejected
    val e2 = intercept[IllegalArgumentException] {
      Table.of(d).filter(at("s") > lit("a"))
    }
    assert(e2.getMessage.contains("gt type error"))
    // literal-only type errors surface at CONSTRUCTION, table or not
    val e3 = intercept[IllegalArgumentException] { lit("a") < lit(1L) }
    assert(e3.getMessage.contains("lt type error"))
    // valid expressions still pass through the typed overloads
    assert(Table.of(d).filter(at("n") < lit(5L) && !(at("s") === lit("y")))
      .rowCount == 1L)
    assert(Table.of(d).each("n2", at("n") + at("d")).toDF.columns.contains("n2"))
    // arithmetic on strings is a builder error too
    val e4 = intercept[IllegalArgumentException] {
      Table.of(d).each("bad", at("s") + at("n"))
    }
    assert(e4.getMessage.contains("type error"))
  }

  implicit class ToLong(e: graft.expr.LExpr) {
    def toLong: graft.expr.LExpr =
      graft.expr.LExpr(e.col.cast(org.apache.spark.sql.types.LongType), e.refs)
  }
}
