package graft

import graft.sources.TableIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** IO parity: signature sniffing, header policies, 50-row inference window,
  * CSV writer knobs, in-memory CSV, sequence columns, BOM. */
class TableIOSpec extends SparkSpec {

  private def tmp(name: String, content: String): String = {
    val p = Files.createTempDirectory("graftio").resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("sniff dispatches on file signature, not extension") {
    val csv = tmp("data.weird", "a,b\n1,2\n")
    assert(TableIO.sniff(csv) == TableIO.Csv)
    val pq = Files.createTempDirectory("graftio").resolve("x.csv")
    Files.write(pq, "PAR1junk".getBytes("ASCII"))
    assert(TableIO.sniff(pq.toString) == TableIO.Parquet) // content wins over .csv ext
    val fea = tmp("f.bin", "FEA1xxxx")
    assert(TableIO.sniff(fea) == TableIO.Feather)
    val xlsx = tmp("x.bin", "PKrest")
    assert(TableIO.sniff(xlsx) == TableIO.Xlsx)
  }

  test("sniff does not misread CSV as ORC/JSON (head-magic collisions)") {
    // a CSV whose header starts with the 3-byte ORC magic must stay CSV —
    // real ORC is confirmed by the tail postscript magic
    val orcish = tmp("authors.csv", "ORCID,name\n0001,ada\n")
    assert(TableIO.sniff(orcish) == TableIO.Csv)
    // bracketed/braced first fields are CSV, not JSON lines
    assert(TableIO.sniff(tmp("b.csv", "[note],x\n1,2\n")) == TableIO.Csv)
    assert(TableIO.sniff(tmp("c.csv", "{tag},x\n1,2\n")) == TableIO.Csv)
    // real JSON-lines objects still detected
    assert(TableIO.sniff(tmp("d.jsonl", "{\"a\": 1}\n{\"a\": 2}\n")) == TableIO.Json)
    // real ORC still detected (Spark-written directory)
    import spark.implicits._
    val dir = Files.createTempDirectory("graftorc").resolve("t.orc").toString
    Seq((1L, "x")).toDF("i", "s").write.orc(dir)
    assert(TableIO.sniff(dir) == TableIO.Orc)
  }

  test("header policies: first-row, generated colN, custom names") {
    val path = tmp("h.csv", "x,y\n1,2\n3,4\n")
    val first = TableIO.readCsv(spark, path, TableIO.CsvOptions())
    assert(first.columns.toSeq == Seq("x", "y"))
    assert(first.count() == 2)
    val gen = TableIO.readCsv(spark, path, TableIO.CsvOptions(TableIO.GenerateColumnNames))
    assert(gen.columns.toSeq == Seq("col0", "col1"))
    assert(gen.count() == 3) // header row becomes data
    val custom = TableIO.readCsv(spark, path, TableIO.CsvOptions(TableIO.CustomNames(Seq("p", "q"))))
    assert(custom.columns.toSeq == Seq("p", "q"))
  }

  test("header parity: empty header cells become MISSING_i (IO/IO.cpp:40-66)") {
    val path = tmp("miss.csv", "a,,c\n1,2,3\n4,5,6\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions())
    assert(df.columns.toSeq == Seq("a", "MISSING_1", "c"))
    assert(df.schema("MISSING_1").dataType == LongType) // 50-row deduction kicks in
    assert(df.count() == 2)
  }

  test("header parity: ragged rows wider than the header pad MISSING_i columns") {
    // fieldCount is the max over ALL records (csv.cpp:264-270): the header
    // "cell" beyond its own length reads as "" -> MISSING_i; short rows
    // null-pad (MissingField::AsNull)
    val path = tmp("ragged.csv", "a,b\n1,2,30\n4,5\n7,8,90\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.columns.toSeq == Seq("a", "b", "MISSING_2"))
    val vals = df.orderBy("a").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(vals.toSeq == Seq((1L, Some(30L)), (4L, None), (7L, Some(90L))))
  }

  test("header parity: simple_empty.csv golden (reference fixture shape)") {
    // data/samples/simple_empty.csv: empty cells are nulls and don't break
    // int64 deduction
    val path = tmp("simple_empty.csv", "a,b,c\n1,2,\n4,,6\n7,8,9\n10,11,12\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(Seq("a", "b", "c").forall(c => df.schema(c).dataType == LongType))
    assert(df.count() == 4)
    assert(df.filter(col("b").isNull).count() == 1)
    assert(df.filter(col("c").isNull).count() == 1)
  }

  test("custom names shorter than the row pad with colN (IO/IO.cpp:59-62)") {
    val path = tmp("pad.csv", "1,2,3\n4,5,6\n")
    val df = TableIO.readCsv(spark, path,
      TableIO.CsvOptions(TableIO.CustomNames(Seq("x"))))
    assert(df.columns.toSeq == Seq("x", "col1", "col2"))
  }

  test("50-row inference window: type decided by the head, tail coerced") {
    // first 50 data rows are ints; row 60 is a string -> whole-file Spark
    // inference would say string; the reference's 50-row window says INT64
    // and nulls the unparseable tail cell
    val rows = (1 to 55).map(i => s"$i").patch(52, Seq("oops"), 1)
    val path = tmp("head.csv", "v\n" + rows.mkString("\n") + "\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.schema("v").dataType == LongType)
    assert(df.filter(df("v").isNull).count() == 1) // "oops" -> null
    // timestamp precedence over string for date-shaped cells
    val p2 = tmp("ts.csv", "t\n2020-01-01\n2020-01-02\n")
    val df2 = TableIO.readCsv(spark, p2, TableIO.CsvOptions(inferOver50Rows = true))
    assert(df2.schema("t").dataType == TimestampType)
  }

  test("per-column independent deduction (variedColumn shape)") {
    // reference data/samples/variedColumn.csv semantics: each column's type
    // deduced independently; empty cells are nulls and don't vote
    val path = tmp("varied.csv",
      "s,t,i,d\n" +
        "hello,2020-01-01,1,1.5\n" +
        "world,,2,2.5\n" +        // empty timestamp cell -> null, still TIMESTAMP
        "42,2020-01-03,3,3\n")    // "42" makes col s STRING; "3" parses double
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.schema("s").dataType == StringType)
    assert(df.schema("t").dataType == TimestampType)
    assert(df.schema("i").dataType == LongType)
    assert(df.schema("d").dataType == DoubleType)
    assert(df.filter(df("t").isNull).count() == 1)
  }

  test("CSV writer: quoteAll, header off, %F timestamps; round-trips") {
    import spark.implicits._
    val df = Seq((1L, "a,b", java.sql.Timestamp.valueOf("2020-05-06 07:08:09")))
      .toDF("i", "s", "t")
    val dir = Files.createTempDirectory("graftw").resolve("out.csv").toString
    TableIO.writeCsv(df, dir, TableIO.CsvWriteOptions(quoteAll = true))
    val text = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".csv")).map(p => new String(Files.readAllBytes(Paths.get(p)))).mkString
    assert(text.contains("\"1\"")) // quote-all quotes unquoted-safe fields too
    assert(text.contains("\"a,b\""))
    assert(text.contains("2020-05-06")) // %F date rendering
    assert(!text.contains("07:08:09"))
    // read back (header from first row)
    val back = TableIO.readCsv(spark, dir, TableIO.CsvOptions())
    assert(back.count() == 1)
  }

  test("CSV from in-memory text") {
    val df = TableIO.readCsvText(spark, "a,b\n1,x\n2,y\n")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
  }

  test("sequence column (createIndex)") {
    val df = TableIO.sequenceColumn(spark, "idx", 5L, 20L, 5L)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, 10L, 15L))
  }

  test("UTF-8 BOM does not corrupt the header") {
    val path = tmp("bom.csv", "﻿foo\n1\n2\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions())
    assert(df.columns.head == "foo")
  }

  test("bucketed tables join WITHOUT a shuffle exchange") {
    import spark.implicits._
    def cleanup(): Unit = Seq("graft_bucket_a", "graft_bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (Files.exists(loc))
        Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
    }
    cleanup()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val a = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, s"n$i")).toDF("k", "vb")
      TableIO.writeBucketed(a, "graft_bucket_a", Seq("k"), 4)
      TableIO.writeBucketed(b, "graft_bucket_b", Seq("k"), 4)
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // both sides read pre-bucketed -> SortMergeJoin with no shuffle
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cleanup()
    }
  }

  test("partitioned layout prunes directories on partition predicates") {
    import spark.implicits._
    val df = Seq((1L, "en", 1.0), (2L, "de", 2.0), (3L, "en", 3.0)).toDF("id", "lang", "v")
    val dir = Files.createTempDirectory("graftpart").resolve("docs").toString
    TableIO.writePartitioned(df, dir, Seq("lang"))
    val read = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(read.count() == 2)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || !scan.contains("lang=de"))
  }

  test("compact rewrites a many-file directory into the byte-target file count") {
    import spark.implicits._
    val in = Files.createTempDirectory("graftcompact").resolve("in").toString
    val out = Files.createTempDirectory("graftcompact").resolve("out").toString
    (0L until 5000L).map(i => (i, s"text $i")).toDF("id", "t")
      .repartition(40).write.parquet(in)
    val inFiles = Files.list(Paths.get(in)).toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(inFiles == 40)
    val bytes = Files.walk(Paths.get(in)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.endsWith(".parquet")).map(Files.size).sum
    TableIO.compact(spark, in, out, targetFileBytes = bytes / 3)
    val outFiles = Files.list(Paths.get(out)).toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(outFiles <= 5, s"expected ~3-4 compacted files, got $outFiles")
    // data unchanged
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      spark.read.parquet(in).orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      TableIO.compact(spark, in, in, 1L)
    }
  }

  test("empty cells parse as nulls (ragged-ish rows)") {
    val path = tmp("holes.csv", "a,b,c\n1,2,\n4,,6\n")
    val df = TableIO.readCsv(spark, path, TableIO.CsvOptions())
    val rows = df.orderBy("a").collect()
    assert(rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1))
  }

  test("quoted separators don't fabricate MISSING_i columns (parity path)") {
    val path = tmp("quoted.csv", "a,b\n1,\"x,y\"\n2,plain\n")
    val df = TableIO.readCsv(spark, path,
      TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.columns.toSeq == Seq("a", "b")) // no MISSING_2 from "x,y"
    assert(df.filter(col("a") === 1).head().getString(1) == "x,y")
  }

  test("dotted header names survive the 50-row deduce path") {
    val path = tmp("dots.csv", "price.usd,qty\n1.5,2\n2.5,3\n")
    val df = TableIO.readCsv(spark, path,
      TableIO.CsvOptions(inferOver50Rows = true))
    assert(df.columns.toSeq == Seq("price.usd", "qty"))
    assert(df.schema.fields(0).dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("readCsvText matches readCsv semantics: name padding + 50-row rule") {
    val short = TableIO.readCsvText(spark, "1,2\n3,4",
      TableIO.CsvOptions(header = TableIO.CustomNames(Seq("a"))))
    assert(short.columns.toSeq == Seq("a", "col1")) // padded, not thrown
    val deduced = TableIO.readCsvText(spark, "x\n1\n2",
      TableIO.CsvOptions(inferOver50Rows = true))
    assert(deduced.schema.fields(0).dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("Avro round-trip: all scalar types + nulls; sniff dispatches on Obj magic") {
    import spark.implicits._
    import java.sql.Timestamp
    val src = Seq(
      (1L, Option(2), Option(3.5), Option(true), Option("hi"),
        Option(Timestamp.valueOf("2024-01-02 03:04:05.123456")),
        Option("bin".getBytes("UTF-8"))),
      (2L, None: Option[Int], None: Option[Double], None: Option[Boolean],
        None: Option[String], None: Option[Timestamp], None: Option[Array[Byte]]))
      .toDF("id", "i", "d", "b", "s", "ts", "bin")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_spec")
    val path = dir.resolve("t.avro").toString
    TableIO.write(src, path)
    assert(TableIO.sniff(path) == TableIO.Avro)
    val back = TableIO.read(spark, path).orderBy("id").collect()
    val orig = src.orderBy("id").collect()
    assert(back.length == 2)
    for (c <- Seq("id", "i", "d", "b", "s", "ts")) {
      val idx = src.schema.fieldIndex(c)
      assert(back(0).get(idx) == orig(0).get(idx), s"col $c")
      assert(back(1).isNullAt(idx) == orig(1).isNullAt(idx), s"col $c null")
    }
    assert(back(0).getAs[Array[Byte]]("bin").toSeq == "bin".getBytes("UTF-8").toSeq)
    assert(back(1).isNullAt(src.schema.fieldIndex("bin")))
    // reader schema mirrors the writer union convention
    assert(TableIO.read(spark, path).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // exchange-path guard refuses oversized writes
    val big = spark.range(0, 10).toDF("id")
    intercept[IllegalArgumentException] {
      graft.sources.AvroIO.write(big, dir.resolve("big.avro").toString, maxRows = 5)
    }
  }

  test("Avro directory of part files reads whole (small files combine into tasks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_parts")
    for (p <- 0 until 3) {
      val part = (p * 10 until p * 10 + 10).map(i => (i.toLong, s"v$i"))
        .toDF("id", "v")
      graft.sources.AvroIO.write(part, dir.resolve(f"part-$p%05d.avro").toString)
    }
    val back = TableIO.read(spark, dir.toString)
    // CombineFileInputFormat packs tiny files into few tasks (the
    // small-files cure); every row from every part must still arrive
    assert(back.count() == 30)
    assert(back.orderBy("id").select("v").as[String].collect()
      .toSeq == (0 until 30).map(i => s"v$i"))
  }
}
