package graft

import graft.sources.{FeatherV1, TableIO}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feather v1 reader against pyarrow-written ground truth (fixtures in
  * src/test/resources/feather, generated with
  * `pyarrow.feather.write_feather(..., version=1)`). */
class FeatherSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/feather/$name").getPath

  test("reads a mixed-type v1 file with nulls (pyarrow ground truth)") {
    val df = FeatherV1.read(spark, fixture("mixed.feather"))
    assert(df.schema == StructType(Seq(
      StructField("i64", LongType), StructField("f64", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("ts", TimestampType), StructField("i32", IntegerType))))
    val rows = df.collect()
    assert(rows.length == 5)
    def cell(r: Int, c: Int): Any = if (rows(r).isNullAt(c)) null else rows(r).get(c)
    assert(Seq(cell(0, 0), cell(1, 0), cell(4, 0)) == Seq(1L, null, -5L))
    assert(Seq(cell(0, 1), cell(2, 1), cell(3, 1)) == Seq(1.5, null, 4.25))
    assert(Seq(cell(0, 2), cell(1, 2), cell(2, 2), cell(3, 2)) == Seq("a", "bb", null, ""))
    assert(Seq(cell(0, 3), cell(1, 3), cell(2, 3)) == Seq(true, false, null))
    assert(cell(3, 4).asInstanceOf[java.sql.Timestamp].getTime == 0L) // epoch
    assert(cell(1, 4) == null)
    assert(Seq(cell(0, 5), cell(3, 5)) == Seq(10, null))
  }

  test("write -> read round-trip preserves values, nulls and types") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(1.5), Some("a"), Some(true), Some(java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123456")), Some(10)),
      (None: Option[Long], None: Option[Double], None: Option[String], None: Option[Boolean], None: Option[java.sql.Timestamp], None: Option[Int]),
      (Some(-3L), Some(0.25), Some(""), Some(false), Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0")), Some(-7)))
      .toDF("i64", "f64", "s", "b", "ts", "i32")
    val tmp = java.nio.file.Files.createTempDirectory("feather").resolve("rt.feather").toString
    FeatherV1.write(df, tmp)
    assert(TableIO.sniff(tmp) == TableIO.Feather)
    val back = FeatherV1.read(spark, tmp)
    assert(back.schema == df.schema)
    val a = df.collect().map(_.toSeq).toSeq
    val b = back.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("round-trips every supported type (byte/short/int/float/date incl.)") {
    import spark.implicits._
    val df = Seq(
      (1.toByte, 10.toShort, 100, 1.5f, java.sql.Date.valueOf("2020-02-29")),
      (-2.toByte, -20.toShort, -200, -0.25f, java.sql.Date.valueOf("1969-12-31")))
      .toDF("i8", "i16", "i32", "f32", "dt")
    val p = java.nio.file.Files.createTempDirectory("feather").resolve("all.feather").toString
    FeatherV1.write(df, p)
    val back = FeatherV1.read(spark, p)
    // nullability is lost on round-trip, same as the reference
    // (Tests.cpp:838-847) — compare names and types only
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("i8").collect().map(_.toSeq).toSeq ==
      df.orderBy("i8").collect().map(_.toSeq).toSeq)
  }

  test("write refuses above maxRows with the scale-sink pointer") {
    val df = spark.range(0, 11).toDF("x")
    val p = java.nio.file.Files.createTempDirectory("feather")
      .resolve("cap.feather").toString
    val e = intercept[IllegalArgumentException] {
      FeatherV1.write(df, p, maxRows = 10)
    }
    assert(e.getMessage.contains("Parquet"))
    assert(!new java.io.File(p).exists()) // refused BEFORE writing bytes
    FeatherV1.write(df, p, maxRows = 11)  // at the cap: writes fine
    assert(FeatherV1.read(spark, p).count() == 11)
  }

  test("reads a null-free v1 file and TableIO.read sniff-dispatches to it") {
    val df = TableIO.read(spark, fixture("nonull.feather"))
    assert(df.count() == 100)
    assert(df.agg(sum(col("x"))).collect()(0).getLong(0) == 4950L)
    assert(df.agg(sum(col("y"))).collect()(0).getDouble(0) == (0 until 100).map(_ * 0.5).sum)
  }
}
