package graft

import graft.core.{SortKey, Table}
import org.apache.spark.sql.functions._

/** Table facade: row order machinery, stable sort, slice, shift, fillNa
  * coercion, interpolate goldens, ungroup null-drop — semantics ported from
  * the reference's golden tests (native_libs/test/Tests.cpp). */
class TableSpec extends SparkSpec {

  test("toList/toText/toJsonString preview in row order; Table.write dispatches") {
    import spark.implicits._
    val t = Table.fromDF(Seq((2L, "b"), (1L, "a"), (3L, "c")).toDF("k", "v"), Seq(col("k")))
    assert(t.toList(2).map(_.getString(1)) == Seq("a", "b"))
    val text = t.toText(3)
    assert(text.startsWith("k") && text.contains("a") && text.linesIterator.size == 4)
    assert(t.toJsonString(1) == """[{"k":1,"v":"a"}]""")
    val dir = java.nio.file.Files.createTempDirectory("twrite")
    t.write(dir.resolve("t.csv").toString)
    assert(graft.sources.TableIO.read(spark, dir.resolve("t.csv").toString).count() == 3)
    t.write(dir.resolve("t.feather").toString)
    assert(graft.sources.TableIO.sniff(dir.resolve("t.feather").toString) == graft.sources.TableIO.Feather)
  }

  test("vocabulary, bigram and length-bucket shapes (pipeline ops)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val vocab = graft.operators.TextOps.vocabulary(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val bigrams = docs.select(
        explode(graft.operators.TextOps.shingles(
          graft.operators.TextOps.tokens(col("text")), 2)).as("bg"))
      .groupBy("bg").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigrams == Map("a b" -> 2L, "b a" -> 1L, "a c" -> 1L))
  }

  test("fromIndexed trusts a pre-materialized gap-free index") {
    import spark.implicits._
    val df = Seq((2L, "c"), (0L, "a"), (1L, "b")).toDF("idx", "v").repartition(3)
    val t = Table.fromIndexed(df, "idx")
    // order-sensitive ops see the idx order without any sort/index pass
    assert(t.slice(1, 2).toDF.collect().map(_.getString(0)).sorted.toSeq == Seq("b", "c"))
    assert(t.shift("v", 1).indexed.orderBy(Table.RowIdx)
      .select("v_shift_1").collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("a"), Some("b")))
  }

  test("equalsTo: ordered arrow-style equality (schema, values, row order)") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, null: String)).toDF("k", "v")
    def tab(df: org.apache.spark.sql.DataFrame) = Table.fromDF(df, Seq(col("k")))
    assert(tab(base).equalsTo(tab(base)))
    // different value
    assert(!tab(base).equalsTo(tab(Seq((1L, "a"), (2L, "X"), (3L, null: String)).toDF("k", "v")))
    )
    // row order matters (reference tables are ordered)
    val reordered = Table.fromDF(base, Seq(col("k").desc))
    assert(!tab(base).equalsTo(reordered))
    // row count mismatch (incl. the all-null-vs-missing corner)
    assert(!tab(base).equalsTo(tab(base.limit(2))))
    // schema: name or type change
    assert(!tab(base).equalsTo(tab(base.withColumnRenamed("v", "w"))))
    assert(!tab(base).equalsTo(tab(base.withColumn("k", col("k").cast("int")))))
  }

  test("groupByToLists keeps row order and null values; null keys group") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30L)),
      (4L, None, Some(40L)),
      (5L, Some("b"), Some(50L)),
      (6L, Some("a"), None))
      .toDF("id", "k", "v")
    val out = Table.fromDF(df, Seq(col("id"))).groupByToLists("k")
      .toDF.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        ((r.getSeq[Long](1), r.getSeq[Any](2)))).toMap
    assert(out("a") == ((Seq(1L, 3L, 6L), Seq(10L, 30L, null))))
    assert(out("b") == ((Seq(2L, 5L), Seq(null, 50L))))
    assert(out(null) == ((Seq(4L), Seq(40L))))
  }

  test("stable multi-key sort ties broken by prior order") {
    import spark.implicits._
    // rows with equal key must keep their original relative order
    val df = Seq((1L, "x"), (2L, "a"), (3L, "x"), (4L, "a"), (5L, "x"))
      .toDF("id", "k")
    val sorted = Table.fromDF(df, Seq(col("id")))
      .sortBy(Seq(SortKey("k", ascending = true, nullsFirst = true)))
      .indexed.orderBy(Table.RowIdx)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(sorted == Seq(2L, 4L, 1L, 3L, 5L))
  }

  test("sort null placement honors nullsFirst/nullsLast") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 1L))
      .toDF("id", "v")
    def order(nullsFirst: Boolean) =
      Table.fromDF(df, Seq(col("id")))
        .sortBy(Seq(SortKey("v", ascending = true, nullsFirst = nullsFirst)))
        .indexed.orderBy(Table.RowIdx).select("id").collect().map(_.getLong(0)).toSeq
    assert(order(true) == Seq(2L, 3L, 1L))
    assert(order(false) == Seq(3L, 1L, 2L))
  }

  test("slice/take/drop over the row order") {
    val df = spark.range(0, 100).toDF("id")
    val tab = Table.fromDF(df, Seq(col("id")))
    assert(tab.slice(10, 5).toDF.collect().map(_.getLong(0)).sorted.toSeq == (10L to 14L))
    assert(tab.take(3).rowCount == 3)
    assert(tab.dropRows(98).rowCount == 2)
    // out-of-range slice clamps to available rows
    assert(tab.slice(95, 50).rowCount == 5)
  }

  test("shift lags with vacated nulls and reference naming") {
    import spark.implicits._
    val df = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val out = Table.fromDF(df, Seq(col("id"))).shift("v", 1)
      .toDF.orderBy("id").select("v_shift_1").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).getDouble(0) == 2.0)
    // negative periods lead
    val lead = Table.fromDF(df, Seq(col("id"))).shift("v", -1)
      .toDF.orderBy("id").select("v_shift_-1").collect()
    assert(lead(0).getDouble(0) == 2.0)
    assert(lead(2).isNullAt(0))
  }

  test("ColumnShift golden: every lag from -4 to 4 on {1,2,3} (Tests.cpp:1063-1089)") {
    import spark.implicits._
    val df = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("id", "v")
    val t = Table.fromDF(df, Seq(col("id")))
    val expect = Map(
      0 -> Seq(Some(1L), Some(2L), Some(3L)),
      1 -> Seq(None, Some(1L), Some(2L)),
      2 -> Seq(None, None, Some(1L)),
      3 -> Seq(None, None, None),
      4 -> Seq(None, None, None),
      -1 -> Seq(Some(2L), Some(3L), None),
      -2 -> Seq(Some(3L), None, None),
      -3 -> Seq(None, None, None),
      -4 -> Seq(None, None, None))
    expect.foreach { case (p, want) =>
      val got = t.shift("v", p).indexed.orderBy(Table.RowIdx)
        .select(s"v_shift_$p").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      assert(got == want, s"periods=$p")
    }
  }

  test("fillNa coerces across types like the reference") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (null.asInstanceOf[java.lang.Long], null, null), (2L, 2.5, "x"))
      .toDF("i", "d", "s")
    // numeric fill: int column gets 7, double 7.0, string "7" (stringified)
    val filled = Table.of(df).fillNa(7L).toDF.filter(col("s") === "7").collect()
    assert(filled.length == 1)
    assert(filled(0).getLong(0) == 7L)
    assert(filled(0).getDouble(1) == 7.0)
    // string fill: parses into numeric columns when parseable
    val filled2 = Table.of(df).fillNa("3").toDF.filter(col("s") === "3").collect()
    assert(filled2.length == 1)
    assert(filled2(0).getLong(0) == 3L)
    assert(filled2(0).getDouble(1) == 3.0)
    // unparseable string skips numeric columns
    val filled3 = Table.of(df).fillNa("zz").toDF
      .filter(col("s") === "zz").collect()
    assert(filled3.length == 1)
    assert(filled3(0).isNullAt(0))
  }

  test("interpolate: interior lerp, edge clamp, int truncation (reference goldens)") {
    import spark.implicits._
    // reference Tests.cpp:1023-1033 semantics
    val df = Seq[(Long, java.lang.Double)](
      (0L, null), (1L, 1.0), (2L, null), (3L, null), (4L, 4.0), (5L, null))
      .toDF("id", "v")
    val out = Table.fromDF(df, Seq(col("id"))).interpolate()
      .toDF.orderBy("id").select("v").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 1.0, 2.0, 3.0, 4.0, 4.0))

    // int64 column stays integral (storage-type lerp truncation)
    val di = Seq[(Long, java.lang.Long)]((0L, 1L), (1L, null), (2L, 2L)).toDF("id", "v")
    val outI = Table.fromDF(di, Seq(col("id"))).interpolate()
      .toDF.orderBy("id").select("v").collect().map(_.getLong(0)).toSeq
    assert(outI == Seq(1L, 1L, 2L)) // lerp 1.5 truncates to 1

    // all-null column unchanged
    val dn = Seq[(Long, java.lang.Double)]((0L, null), (1L, null)).toDF("id", "v")
    assert(Table.fromDF(dn, Seq(col("id"))).interpolate()
      .toDF.collect().forall(_.isNullAt(1)))

    // the reference's exact InterpolateNA sequences (Tests.cpp:1023-1033)
    val seq1 = Seq[java.lang.Double](null, null, 1.0, 2.0, null, 3.0,
      null, null, null, 4.0, null)
    val d1 = seq1.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got1 = Table.fromDF(d1, Seq(col("id"))).interpolate()
      .toDF.orderBy("id").select("v").collect().map(_.getDouble(0)).toSeq
    assert(got1 == Seq(1.0, 1.0, 1.0, 2.0, 2.5, 3.0, 3.25, 3.5, 3.75, 4.0, 4.0))
    val seq2 = Seq[java.lang.Long](null, 10L, null, null, 16L, null)
    val d2 = seq2.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got2 = Table.fromDF(d2, Seq(col("id"))).interpolate()
      .toDF.orderBy("id").select("v").collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(10L, 10L, 12L, 14L, 16L, 16L))
  }

  test("interpolateWithin fills per key, clamping at each key's edges") {
    import spark.implicits._
    val df = Seq[(Long, String, java.lang.Double)](
      (0L, "a", 1.0), (1L, "a", null), (2L, "a", 3.0),
      (3L, "b", null), (4L, "b", 10.0), (5L, "b", null))
      .toDF("id", "k", "v")
    val out = Table.fromDF(df, Seq(col("id"))).interpolateWithin(Seq(col("k")))
      .toDF.orderBy("id").select("v").collect().map(_.getDouble(0)).toSeq
    // key a: interior lerp 2.0; key b: leading/trailing clamp to 10.0 —
    // key a's values never leak into key b
    assert(out == Seq(1.0, 2.0, 3.0, 10.0, 10.0, 10.0))
  }

  test("shiftWithin lags inside each key only") {
    import spark.implicits._
    val df = Seq((0L, "a", 1.0), (1L, "a", 2.0), (2L, "b", 3.0), (3L, "b", 4.0))
      .toDF("id", "k", "v")
    val out = Table.of(df).shiftWithin("v", 1, Seq(col("k")), Seq(col("id")))
      .toDF.orderBy("id").select("v_shift_1").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).isNullAt(0)) // key boundary: b's first row has no lag
    assert(out(3).getDouble(0) == 3.0)
  }

  test("ungroup drops null-string rows, keeps empty string as one element") {
    import spark.implicits._
    val df = Seq((1L, "a,b"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("id", "tags")
    val out = Table.of(df).ungroupSplittingOn("tags", ",").toDF
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // null row 2 disappears (explode, not explode_outer); "" yields [""]
    assert(out == Seq((1L, "a"), (1L, "b"), (3L, "")))
  }

  test("horizontal concat zips by row position") {
    import spark.implicits._
    val a = Table.fromDF(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), Seq(col("id")))
    val b = Table.fromDF(Seq((10.5, 20L), (30.5, 40L)).toDF("d", "l"), Seq(col("l")))
    val out = a.concat(b).toDF.orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getDouble(2) == 10.5)
  }

  test("concat pads the shorter table with nulls (Tests.cpp:1108-1123)") {
    import spark.implicits._
    val a = Table.fromDF(Seq(1L, 2L, 3L).toDF("i"), Seq(col("i")))
    val b = Table.fromDF(Seq((1.0, 0L), (2.0, 1L), (4.0, 3L)).toDF("d", "o")
      .union(Seq((8.0, 4L)).toDF("d", "o")), Seq(col("o")))
    val out = a.concat(b).indexed.orderBy(Table.RowIdx)
      .select("i", "d").collect()
    assert(out.length == 4) // longer length wins
    assert(out(3).isNullAt(0) && out(3).getDouble(1) == 8.0) // padded left side
    assert(out(0).getLong(0) == 1L && out(0).getDouble(1) == 1.0)
  }

  test("addColumnAt inserts at position; removeByIndex drops by position") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("a", "b")
    val t2 = Table.of(df).addColumnAt(1, "mid", lit(9))
    assert(t2.columnNames == Seq("a", "mid", "b"))
    assert(t2.removeByIndex(0).columnNames == Seq("mid", "b"))
  }

  test("dropNa any-column and single-column") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, null), (null.asInstanceOf[java.lang.Long], 2.0), (3L, 3.0))
      .toDF("a", "b")
    assert(Table.of(df).dropNa().rowCount == 1)
    assert(Table.of(df).dropNaAt("a").rowCount == 2)
  }

  test("fillNa works on an indexed (fromDF/sorted) table") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (2L, 2.5), (3L, null))
      .toDF("id", "v")
    val tab = Table.fromDF(df, Seq(col("id")))
      .sortBy(Seq(SortKey("id", ascending = false, nullsFirst = true)))
    val out = tab.fillNa(9.0)
    val vals = out.indexed.orderBy(Table.RowIdx)
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(vals == Seq(9.0, 2.5, 9.0))
    // the pre-existing row order survives the fill
    val ids = out.indexed.orderBy(Table.RowIdx)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 2L, 1L))
  }

  test("row-removing ops compact the row order") {
    val df = spark.range(0, 10).toDF("id")
    val filtered = Table.fromDF(df, Seq(col("id"))).filter(col("id") % 2 === 0)
    // take(3) selects the first 3 SURVIVING rows, not original positions <3
    assert(filtered.take(3).toDF.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 2L, 4L))
    val idx = filtered.indexed.orderBy(Table.RowIdx)
      .select(Table.RowIdx).collect().map(_.getLong(0)).toSeq
    assert(idx == (0L until 5L).toSeq)
  }

  test("interpolate after a row removal lerps over compacted positions") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (0L, 0.0), (1L, null), (2L, 99.0), (3L, 3.0)).toDF("id", "v")
    val out = Table.fromDF(df, Seq(col("id")))
      .filter(col("id") =!= 2L)   // surviving order: 0, 1, 3
      .interpolateAt("v")
      .toDF.orderBy("id").select("v").collect().map(_.getDouble(0)).toSeq
    // position-based lerp midway between 0.0 and 3.0 -> 1.5; a gapped index
    // (0,1,3) would give t=1/3 -> 1.0
    assert(out == Seq(0.0, 1.5, 3.0))
  }

  test("zipIndexed assigns a gap-free permutation after a shuffle") {
    val df = spark.range(0, 10000).toDF("id").repartition(13)
    val ix = Table.fromDF(df, Seq((col("id") % 7).asc, col("id").asc)).indexed
    val r = ix.agg(min(col(Table.RowIdx)), max(col(Table.RowIdx)),
      countDistinct(col(Table.RowIdx)), count(lit(1))).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 9999L &&
      r.getLong(2) == 10000L && r.getLong(3) == 10000L)
  }

  test("interpolate preserves long values beyond 2^53 on non-null rows") {
    import spark.implicits._
    val big = 9007199254740993L // 2^53 + 1: not double-representable
    val df = Seq[java.lang.Long](big, null, 10L).toDF("v")
    val out = Table.of(df).interpolate()
      .indexed.orderBy(Table.RowIdx)
      .select("v").collect().map(_.getLong(0)).toSeq
    assert(out.head == big) // a double round-trip would read ...992
    assert(out(2) == 10L)
  }

  test("slice saturates instead of overflowing; dropRows rejects negatives") {
    val t = Table.of(spark.range(0, 5).toDF("id"))
    assert(t.slice(1, Long.MaxValue).rowCount == 4) // "the rest" idiom
    intercept[IllegalArgumentException](t.dropRows(-1))
  }

  test("addColumnAt keeps a materialized row index (no re-zip)") {
    val t = Table.fromDF(spark.range(0, 6).toDF("id"), Seq(col("id").desc))
      .addColumnAt(0, "x", col("id") * 2)
    // order-sensitive op after the insert still sees the sort's order
    assert(t.columnNames.head == "x")
    assert(t.take(2).toDF.select("id").collect().map(_.getLong(0)).toSeq ==
      Seq(5L, 4L))
    // the materialized index survived the insert (no second zipIndexed):
    // indexed must be resolvable without re-deriving order from scratch
    assert(t.indexed.columns.contains(Table.RowIdx))
  }
}
