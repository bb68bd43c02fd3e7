package graft

import graft.core.Table
import graft.expr.LQueryJson

/** Wire-format parity: the reference's serialized LQuery JSON runs
  * unchanged (node forms from LQuery/AST.cpp, semantics from the
  * FilteringFixture golden tests). */
class LQueryJsonSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "aa"), (2L, null, "ab"), (3L, 30.0, null), (4L, 40.0, "bb"))
      .toDF("a", "b", "s")
  }

  private def filterIds(json: String): Seq[Long] =
    Table.of(df).filter(LQueryJson.parsePredicate(df, json).toFilter)
      .toDF.select("a").collect().map(_.getLong(0)).sorted.toSeq

  test("predicate nodes: gt, boolean and/or, null-guard semantics") {
    assert(filterIds("""{"predicate":"gt","arguments":[{"column":"a"},2]}""") == Seq(3L, 4L))
    // b referenced anywhere -> row 2 (null b) excluded even though a>0
    assert(filterIds(
      """{"boolean":"or","arguments":[
        |{"predicate":"gt","arguments":[{"column":"a"},0]},
        |{"predicate":"gt","arguments":[{"column":"b"},0.0]}]}""".stripMargin)
      == Seq(1L, 3L, 4L))
    assert(filterIds(
      """{"boolean":"not","arguments":[{"predicate":"lt","arguments":[{"column":"a"},3]}]}""")
      == Seq(3L, 4L))
  }

  test("FilterWithNulls golden (Tests.cpp:714-802): a%2==0 over nulls") {
    // reference: 256 rows; a null every 3rd, b null every 7th; filter
    // a%2==0 drops null-a rows (any-referenced-null) but keeps null b
    import spark.implicits._
    val rows = (0 until 256).map { i =>
      (if (i % 3 != 0) Some(i.toLong) else None,
        if (i % 7 != 0) Some(i.toString) else None)
    }
    val df = rows.toDF("a", "b")
    val json =
      """{"predicate": "eq","arguments":[
        |  {"operation": "mod","arguments":[{"column": "a"}, 2]}, 0]}""".stripMargin
    val pred = graft.expr.LQueryJson.parsePredicate(df, json)
    val got = graft.core.Table.of(df).filter(pred.toFilter)
      .toDF.orderBy("a").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val expect = (0 until 256)
      .filter(i => i % 3 != 0 && i % 2 == 0)
      .map(i => (i.toLong, if (i % 7 != 0) Some(i.toString) else None))
    assert(got == expect)
  }

  test("string predicates: startsWith, full-string matches, eq") {
    assert(filterIds("""{"predicate":"startsWith","arguments":[{"column":"s"},"a"]}""")
      == Seq(1L, 2L))
    assert(filterIds("""{"predicate":"matches","arguments":[{"column":"s"},"a."]}""")
      == Seq(1L, 2L))
    // non-anchored pattern does NOT partial-match
    assert(filterIds("""{"predicate":"matches","arguments":[{"column":"s"},"a"]}""").isEmpty)
    assert(filterIds("""{"predicate":"eq","arguments":[{"column":"s"},"bb"]}""") == Seq(4L))
  }

  test("type errors: string ordering and mixed eq are rejected") {
    assertThrows[IllegalArgumentException] {
      filterIds("""{"predicate":"gt","arguments":[{"column":"s"},"a"]}""")
    }
    assertThrows[IllegalArgumentException] {
      filterIds("""{"predicate":"eq","arguments":[{"column":"s"},1]}""")
    }
  }

  test("value nodes: arithmetic promotion, int division, condition") {
    val v = LQueryJson.parseValue(df,
      """{"operation":"divide","arguments":[{"column":"a"},2]}""")
    val out = Table.of(df).each("r", v.toMap).toDF.orderBy("a")
      .select("r").collect()
    assert(out(0).getLong(0) == 0L) // 1/2 int division
    assert(out(2).getLong(0) == 1L) // 3/2
    // mixed int/double promotes to double division
    val vd = LQueryJson.parseValue(df,
      """{"operation":"divide","arguments":[{"column":"a"},2.0]}""")
    val outD = Table.of(df).each("r", vd.toMap).toDF.orderBy("a").select("r").collect()
    assert(outD(0).getDouble(0) == 0.5)
    // condition with both-branch null guard: row 2 nulls (b in untaken branch)
    val c = LQueryJson.parseValue(df,
      """{"condition":{"predicate":"lt","arguments":[{"column":"a"},3]},
        |"onTrue":{"operation":"plus","arguments":[{"column":"a"},100]},
        |"onFalse":{"operation":"times","arguments":[{"column":"b"},2.0]}}""".stripMargin)
    val outC = Table.of(df).each("r", c.toMap).toDF.orderBy("a").select("r").collect()
    assert(outC(0).getDouble(0) == 101.0)
    assert(outC(1).isNullAt(0))
    assert(outC(3).getDouble(0) == 80.0)
  }

  test("fuzz: random predicate trees — JSON wire path equals the Scala builder") {
    import spark.implicits._
    import graft.expr.{LExpr, LQuery}
    val df = (0 until 200).map { i =>
      (if (i % 5 == 0) None else Some(i.toLong),
        if (i % 7 == 0) None else Some(i.toDouble / 3),
        i.toLong)
    }.toDF("a", "b", "id")
    val rnd = new scala.util.Random(77)
    // random tree over the shared grammar; returns (json, builder) pairs
    def value(depth: Int): (String, LExpr) =
      if (depth == 0) rnd.nextInt(3) match {
        case 0 => ("""{"column": "a"}""", LQuery.at("a"))
        case 1 => ("""{"column": "b"}""", LQuery.at("b"))
        case _ =>
          val v = rnd.nextInt(40); (v.toString, LQuery.lit(v.toLong))
      } else {
        val (lj, lb) = value(depth - 1); val (rj, rb) = value(depth - 1)
        val ops = Seq(("plus", (x: LExpr, y: LExpr) => x + y),
          ("minus", (x: LExpr, y: LExpr) => x - y),
          ("times", (x: LExpr, y: LExpr) => x * y))
        val (name, f) = ops(rnd.nextInt(ops.length))
        (s"""{"operation": "$name", "arguments": [$lj, $rj]}""", f(lb, rb))
      }
    def predicate(): (String, LExpr) = {
      val (lj, lb) = value(rnd.nextInt(3)); val (rj, rb) = value(rnd.nextInt(3))
      val cmp = rnd.nextInt(3) match {
        case 0 => (s"""{"predicate": "gt", "arguments": [$lj, $rj]}""", lb > rb)
        case 1 => (s"""{"predicate": "lt", "arguments": [$lj, $rj]}""", lb < rb)
        case _ => (s"""{"predicate": "eq", "arguments": [$lj, $rj]}""", lb === rb)
      }
      if (rnd.nextBoolean()) cmp
      else {
        val (oj, ob) = (s"""{"predicate": "gt", "arguments": [{"column": "a"}, 7]}""",
          LQuery.at("a") > LQuery.lit(7L))
        (s"""{"boolean": "and", "arguments": [${cmp._1}, $oj]}""", cmp._2 && ob)
      }
    }
    var compared = 0
    (0 until 40).foreach { _ =>
      val (json, built) = predicate()
      val viaJson = try Some(graft.expr.LQueryJson.parsePredicate(df, json))
        catch { case _: IllegalArgumentException => None } // type-rejected trees
      viaJson.foreach { p =>
        val a = graft.core.Table.of(df).filter(p.toFilter).toDF
          .select("id").collect().map(_.getLong(0)).toSet
        val b = graft.core.Table.of(df).filter(built).toDF
          .select("id").collect().map(_.getLong(0)).toSet
        assert(a == b, s"mismatch for $json")
        compared += 1
      }
    }
    assert(compared >= 20) // most random trees are well-typed
  }

  test("truncated / malformed wire input fails with the documented error") {
    import graft.expr.LQueryJson
    for (bad <- Seq("""{"predicate": "gt""", """{"x": "unterminated""",
        """{"n": 99999999999999999999999}""")) {
      val e = intercept[IllegalArgumentException](
        LQueryJson.parsePredicate(spark.range(1).toDF("a"), bad))
      assert(e.getMessage.contains("LQuery JSON parse error"))
    }
  }

  test("timestampNs literal and calendar ops") {
    import spark.implicits._
    val tdf = Seq((1L, java.sql.Timestamp.valueOf("2018-09-02 00:00:00")))
      .toDF("id", "e")
    val y = LQueryJson.parseValue(tdf, """{"operation":"year","arguments":[{"column":"e"}]}""")
    assert(Table.of(tdf).each("y", y.toMap).toDF.select("y").collect()(0).getLong(0) == 2018L)
    val sep2ns = java.sql.Timestamp.valueOf("2018-09-02 00:00:00").getTime * 1000000L
    val p = LQueryJson.parsePredicate(tdf,
      s"""{"predicate":"gt","arguments":[{"column":"e"},{"timestampNs":${sep2ns - 1000000000L}}]}""")
    assert(Table.of(tdf).filter(p.toFilter).rowCount == 1)
  }
}
