package graft

import graft.core.{SortKey, Table}
import graft.expr.LQuery
import graft.operators.{Aggregates => A, Stats}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Reference golden fixtures ported verbatim from FIXTURES.md
  * (reference: native_libs/test/Tests.cpp, src/Internal/Test/Test.luna). */
class ReferenceGoldenSpec extends SparkSpec {

  // ---- FilteringFixture (Tests.cpp:285-293) ----
  private lazy val filtering = {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", DoubleType, nullable = false),
      StructField("c", StringType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("e", TimestampType, nullable = true)))
    val rows = Seq(
      Row(-1L, 5.0, "foo", 1.0, Timestamp.valueOf("2018-09-01 00:00:00")),
      Row(2L, 10.0, "bar", 2.0, Timestamp.valueOf("2018-09-02 00:00:00")),
      Row(3L, 0.0, "baz", null, null),
      Row(-4L, -10.0, "", 4.0, Timestamp.valueOf("2020-11-04 00:00:00")),
      Row(5L, -5.0, "1", null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def ids(t: Table): Seq[Long] =
    t.toDF.select("a").collect().map(_.getLong(0)).sorted.toSeq

  test("FilteringFixture: comparison and boolean operators") {
    import LQuery._
    assert(ids(Table.of(filtering).filter((at("a") > lit(2L)).toFilter)) == Seq(3L, 5L))
    assert(ids(Table.of(filtering).filter((at("b") < lit(5.0)).toFilter)) == Seq(-4L, 3L, 5L))
    assert(ids(Table.of(filtering).filter((at("c") === lit("foo")).toFilter)) == Seq(-1L))
    assert(ids(Table.of(filtering).filter((!(at("a") > lit(0L))).toFilter)) == Seq(-4L, -1L))
    assert(ids(Table.of(filtering).filter(
      ((at("a") > lit(0L)) && (at("b") > lit(0.0))).toFilter)) == Seq(2L))
    // null guard: d referenced -> rows 3,5 excluded even where pred true
    assert(ids(Table.of(filtering).filter((at("d") > lit(0.0)).toFilter)) == Seq(-4L, -1L, 2L))
  }

  test("FilteringFixture: timestamp ordering and calendar fields") {
    import LQuery._
    val sep2 = Timestamp.valueOf("2018-09-02 00:00:00").getTime
    val pred = at("e") > timestampNs(sep2 * 1000000L - 1000000000L)
    // e > 2018-09-01T23:59:59 -> rows 2 (09-02) and -4 (2020); nulls out
    assert(ids(Table.of(filtering).filter(pred.toFilter)) == Seq(-4L, 2L))
    val years = Table.of(filtering).each("y", at("e").year_.toMap).toDF
      .select("a", "y").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(years(-1L).contains(2018))
    assert(years(3L).isEmpty)
    assert(years(-4L).contains(2020))
  }

  test("FilteringFixture: arithmetic map with condition") {
    import LQuery._
    // condition(a > 0, b * 2, b - 1): d/e untouched -> no extra null guard
    val v = condition(at("a") > lit(0L), at("b") * lit(2.0), at("b") - lit(1.0))
    val out = Table.of(filtering).each("r", v.toMap).toDF
      .select("a", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(-1L -> 4.0, 2L -> 20.0, 3L -> 0.0, -4L -> -11.0, 5L -> -10.0))
  }

  // ---- SortSimple (Tests.cpp:75-130) ----
  private lazy val sortSimple = {
    val schema = StructType(Seq(
      StructField("ints", LongType, nullable = true),
      StructField("doubles", DoubleType, nullable = true),
      StructField("strings", StringType, nullable = true),
      StructField("iota", LongType, nullable = false)))
    val ints = Seq[Any](null, 1L, 2L, null, 1L, 2L, null, 2L, 1L)
    val doubles = Seq[Any](20.0, 8.0, null, null, 16.0, 9.0, 10.0, 3.0, null)
    val strings = Seq[Any](null, "one", null, "4", "4", "five", null, "7", "7")
    val rows = (0 until 9).map(i => Row(ints(i), doubles(i), strings(i), i.toLong))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def sortedIota(keys: SortKey*): Seq[Long] =
    Table.fromDF(sortSimple, Seq(col("iota")))
      .sortBy(keys)
      .indexed.orderBy(Table.RowIdx).select("iota").collect().map(_.getLong(0)).toSeq

  test("SortSimple: single-key permutations with null placement (stable)") {
    // ints asc nulls-first: nulls (0,3,6) then 1s (1,4,8) then 2s (2,5,7)
    assert(sortedIota(SortKey("ints", true, true)) == Seq(0L, 3L, 6L, 1L, 4L, 8L, 2L, 5L, 7L))
    // ints asc nulls-last
    assert(sortedIota(SortKey("ints", true, false)) == Seq(1L, 4L, 8L, 2L, 5L, 7L, 0L, 3L, 6L))
    // ints desc nulls-first
    assert(sortedIota(SortKey("ints", false, true)) == Seq(0L, 3L, 6L, 2L, 5L, 7L, 1L, 4L, 8L))
    // strings asc nulls-first: nulls(0,2,6), "4"(3,4), "7"(7,8), "five"(5), "one"(1)
    assert(sortedIota(SortKey("strings", true, true)) == Seq(0L, 2L, 6L, 3L, 4L, 7L, 8L, 5L, 1L))
  }

  test("SortSimple: multi-key lexicographic") {
    // ints asc nulls-first, then doubles desc nulls-last within ties
    val got = sortedIota(SortKey("ints", true, true), SortKey("doubles", false, false))
    // nulls group (0:20.0, 3:null, 6:10.0) -> 0,6,3
    // ints=1 (1:8.0, 4:16.0, 8:null) -> 4,1,8
    // ints=2 (2:null, 5:9.0, 7:3.0) -> 5,7,2
    assert(got == Seq(0L, 6L, 3L, 4L, 1L, 8L, 5L, 7L, 2L))
  }

  // ---- AggregateBy fixture (Test.luna:669-683) ----
  test("AggregateBy fixture: null key group, exact double outputs") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("a", LongType, nullable = true)))
    val id = Seq[Any](null, 1L, 2L, 1L, null, 5L, 2L, 2L, 4L)
    val a = Seq[Any](5L, 8L, 3L, 1L, 5L, 2L, 8L, 7L, null)
    val rows = (0 until 9).map(i => Row(id(i), a(i)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .withColumn("ord", col("a")) // stand-in; use explicit iota below
    val df2 = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 9).map(i => Row(id(i), a(i), i.toLong)), 2),
      schema.add(StructField("ord", LongType, nullable = false)))
    val out = A.aggregateByOrdered(df2, "id", Seq(col("ord")),
      Seq("a" -> Seq(A.Minimum, A.Maximum, A.Mean, A.Length, A.Median, A.First, A.Last)))
      .orderBy(col("id").asc_nulls_first).collect()
    // null key group: values 5,5
    val g0 = out(0)
    assert(g0.isNullAt(0))
    assert(g0.getAs[Double]("a_min") == 5.0 && g0.getAs[Double]("a_max") == 5.0)
    assert(g0.getAs[Double]("a_length") == 2.0)
    // id=1: values 8,1 -> min 1 max 8 mean 4.5 median 4.5 first 8 last 1
    val g1 = out(1)
    assert(g1.getAs[Double]("a_mean") == 4.5 && g1.getAs[Double]("a_median") == 4.5)
    assert(g1.getAs[Double]("a_first") == 8.0 && g1.getAs[Double]("a_last") == 1.0)
    // id=2: values 3,8,7 -> median 7
    val g2 = out(2)
    assert(g2.getAs[Double]("a_median") == 7.0)
    // id=4: only null -> min/median null, length 1
    val g4 = out(3)
    assert(g4.isNullAt(g4.fieldIndex("a_min")))
    assert(g4.getAs[Double]("a_length") == 1.0)
  }

  // ---- Rolling-interval fixture (Test.luna:684-695) ----
  test("Rolling fixture: 2s interval sums [0,1,3,0->2,4]") {
    val rows = Seq(
      ("2013-01-01 09:00:00", Some(0.0)), ("2013-01-01 09:00:02", Some(1.0)),
      ("2013-01-01 09:00:03", Some(2.0)), ("2013-01-01 09:00:05", None),
      ("2013-01-01 09:00:06", Some(4.0)))
    val schema = StructType(Seq(
      StructField("time", TimestampType, nullable = false),
      StructField("val", DoubleType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (t, v) => Row(Timestamp.valueOf(t), v.orNull) }, 1), schema)
    val out = Stats.rollingInterval(df, "time", 2L * 1000 * 1000,
        Seq("val" -> Seq(A.Sum, A.Length)))
      .orderBy("time").collect()
    // window (t-2s, t]: [0], [1], [1,2], [null], [null,4]
    assert(out.map(_.getAs[Double]("val_sum")).toSeq == Seq(0.0, 1.0, 3.0, 0.0, 4.0))
    assert(out.map(_.getAs[Double]("val_length")).toSeq == Seq(1.0, 1.0, 2.0, 1.0, 2.0))
  }

  // ---- Statistics fixture (Tests.cpp:955-1012) ----
  test("Statistics fixture: ints with nulls, RSI goldens") {
    val schema = StructType(Seq(StructField("v", LongType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq[Any](1L, 1L, null, 3L, null, 11L).map(Row(_)), 2), schema)
    val st = Stats.describeColumn(df, "v").collect()(0)
    assert(st.getAs[Double]("min") == 1.0)
    assert(st.getAs[Double]("max") == 11.0)
    assert(st.getAs[Double]("mean") == 4.0)
    assert(st.getAs[Double]("median") == 2.0) // interpolated over [1,1,3,11]

    import spark.implicits._
    def rsi(vals: Seq[java.lang.Double]): Option[Double] = {
      val d = vals.toDF("v")
      val r = A.aggregateByOrdered(d.withColumn("k", lit(1)), "k", Seq(lit(1)),
        Seq("v" -> Seq(A.Rsi))).collect()(0)
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    }
    assert(rsi(Seq(5.0, 10.0, 6.0)).contains(100.0))
    assert(rsi(Seq(-5.0, -10.0, -6.0)).contains(0.0))
    assert(rsi(Seq(null)).isEmpty)
  }

  // ---- FilterWithNulls stress (Tests.cpp:714-800) ----
  test("FilterWithNulls: 256-row null-stress filter across partitionings") {
    import graft.expr.LQuery._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = true),
      StructField("iota", LongType, nullable = false)))
    val rows = (0 until 256).map { i =>
      Row(if (i % 3 == 0) null else Long.box(i.toLong),
        if (i % 7 == 0) null else i.toString, i.toLong)
    }
    // model: a % 2 == 0 over valid a (nulls excluded)
    val want = (0 until 256).filter(i => i % 3 != 0 && i % 2 == 0).map(_.toLong)
    for (parts <- Seq(1, 3, 8, 32)) {
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
      val got = Table.of(df)
        .filter(((at("a") % lit(2L)) === lit(0L)).toFilter)
        .toDF.select("iota").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"parts=$parts")
      // null b values survive in non-referenced columns
      val withNullB = Table.of(df)
        .filter(((at("a") % lit(2L)) === lit(0L)).toFilter)
        .toDF.filter(col("b").isNull).count()
      assert(withNullB == want.count(_ % 7 == 0), s"parts=$parts")
    }
  }

  // ---- Interpolation timestamps golden (Tests.cpp:887-897) ----
  test("interpolate timestamps: 09-01,null,null,09-10 -> 1st,4th,7th,10th") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t", TimestampType, nullable = true)))
    val rows = Seq(
      Row(0L, Timestamp.valueOf("2018-09-01 00:00:00")),
      Row(1L, null), Row(2L, null),
      Row(3L, Timestamp.valueOf("2018-09-10 00:00:00")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Table.fromDF(df, Seq(col("id"))).interpolate()
      .toDF.orderBy("id").select("t").collect().map(_.getTimestamp(0).toString).toSeq
    assert(out == Seq("2018-09-01 00:00:00.0", "2018-09-04 00:00:00.0",
      "2018-09-07 00:00:00.0", "2018-09-10 00:00:00.0"))
  }

  test("interpolate on a string column raises (reference type check)") {
    import spark.implicits._
    val df = Seq((0L, "x"), (1L, null.asInstanceOf[String])).toDF("id", "s")
    assertThrows[IllegalArgumentException] {
      Table.fromDF(df, Seq(col("id"))).interpolateAt("s")
    }
  }

  // ---- GroupBy-to-lists (Benchmarks.cpp:324-351) ----
  test("groupBy to list-columns via collect_list over row order") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("iota", LongType, nullable = false)))
    val idv = Seq(1L, 1L, 2L, 3L, 1L, 2L, 3L, 4L, 5L, 4L)
    val rows = idv.zipWithIndex.map { case (id, i) => Row(id, i.toLong) }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    // order-preserving list: sort_array over (iota) structs
    val out = df.groupBy("id")
      .agg(sort_array(collect_list(struct(col("iota")))).as("xs"))
      .select(col("id"), col("xs.iota").as("iotas"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq(0L, 1L, 4L))
    assert(out(3).getSeq[Long](1) == Seq(7L, 9L))
  }
}
