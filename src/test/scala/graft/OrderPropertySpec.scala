package graft

import graft.core.{SortKey, Table}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property-style tests for the row-order machinery — SURVEY §7.1 calls it
  * the hardest correctness surface: every order-sensitive op is checked
  * against a sequential Scala model on seeded-random data (values, nulls,
  * partition layouts, all sort-direction combos). Plain seeded trials: the
  * scalatestplus-scalacheck bridge isn't in the offline dep set. */
class OrderPropertySpec extends SparkSpec {

  private def randRows(rnd: scala.util.Random, n: Int): List[(Option[Long], Option[Double])] =
    List.fill(n)((
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(11).toLong - 5), // many ties
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(7) - 3.0)))

  private def mkDf(rows: List[(Option[Long], Option[Double])], parts: Int) = {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", DoubleType, nullable = true),
      StructField("iota", LongType, nullable = false)))
    val data = rows.zipWithIndex.map { case ((a, b), i) =>
      Row(a.map(Long.box).orNull, b.map(Double.box).orNull, i.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, parts), schema)
  }

  /** Scala model of the reference's stable multi-key sort. */
  private def modelSort(rows: List[(Option[Long], Option[Double])],
      keys: Seq[SortKey]): Seq[Long] = {
    def cmp(k: SortKey, x: (Option[Long], Option[Double]),
        y: (Option[Long], Option[Double])): Int = {
      def ord[T](xo: Option[T], yo: Option[T])(implicit o: Ordering[T]): Int = (xo, yo) match {
        case (None, None) => 0
        case (None, _)    => if (k.nullsFirst) -1 else 1
        case (_, None)    => if (k.nullsFirst) 1 else -1
        case (Some(xv), Some(yv)) =>
          val c = o.compare(xv, yv); if (k.ascending) c else -c
      }
      k.name match {
        case "a" => ord(x._1, y._1)
        case "b" => ord(x._2, y._2)
      }
    }
    rows.zipWithIndex
      .sortWith { case ((x, xi), (y, yi)) =>
        val c = keys.iterator.map(k => cmp(k, x, y)).find(_ != 0).getOrElse(0)
        if (c != 0) c < 0 else xi < yi // stability
      }
      .map(_._2.toLong)
  }

  test("sortBy matches the stable sequential model for every key combo") {
    val rnd = new scala.util.Random(2024)
    for (trial <- 0 until 10) {
      val rows = randRows(rnd, 40)
      val parts = 1 + rnd.nextInt(7)
      val keys = Seq(
        SortKey("a", rnd.nextBoolean(), rnd.nextBoolean()),
        SortKey("b", rnd.nextBoolean(), rnd.nextBoolean()))
      val got = Table.fromDF(mkDf(rows, parts), Seq(col("iota")))
        .sortBy(keys)
        .indexed.orderBy(Table.RowIdx).select("iota")
        .collect().map(_.getLong(0)).toSeq
      assert(got == modelSort(rows, keys), s"trial=$trial keys=$keys parts=$parts")
    }
  }

  test("slice matches the list model at any partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val rows = randRows(rnd, 40)
      val parts = 1 + rnd.nextInt(7)
      val beg = rnd.nextInt(46)
      val cnt = rnd.nextInt(21)
      val got = Table.fromDF(mkDf(rows, parts), Seq(col("iota")))
        .slice(beg.toLong, cnt.toLong)
        .indexed.orderBy(Table.RowIdx).select("iota")
        .collect().map(_.getLong(0)).toSeq
      assert(got == (0L until rows.size.toLong).slice(beg, beg + cnt),
        s"trial=$trial beg=$beg cnt=$cnt parts=$parts")
    }
  }

  test("shift matches the list model (lag and lead) at any partitioning") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 10) {
      val rows = randRows(rnd, 30)
      val parts = 1 + rnd.nextInt(7)
      val n = rnd.nextInt(7) - 3
      val got = Table.fromDF(mkDf(rows, parts), Seq(col("iota")))
        .shift("b", n)
        .toDF.orderBy("iota").select(s"b_shift_$n")
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      val bs = rows.map(_._2)
      val none = None: Option[Double]
      val want: Seq[Option[Double]] =
        if (n >= 0) List.fill(math.min(n, bs.size))(none) ++ bs.dropRight(n)
        else bs.drop(-n) ++ List.fill(math.min(-n, bs.size))(none)
      assert(got == want, s"trial=$trial n=$n parts=$parts")
    }
  }

  test("interpolate matches the sequential lerp model at any partitioning") {
    def model(vs: List[Option[Double]]): List[Option[Double]] = {
      val n = vs.size
      val idx = vs.zipWithIndex
      val valid = idx.collect { case (Some(v), i) => (i, v) }
      if (valid.isEmpty) vs
      else idx.map { case (vo, i) =>
        vo match {
          case Some(v) => Some(v)
          case None =>
            val prev = valid.filter(_._1 < i).lastOption
            val next = valid.find(_._1 > i)
            (prev, next) match {
              case (None, Some((_, nv)))          => Some(nv) // leading clamp
              case (Some((_, pv)), None)          => Some(pv) // trailing clamp
              case (Some((pi, pv)), Some((ni, nv))) =>
                val t = (i - pi).toDouble / (ni - pi)
                Some((1 - t) * pv + t * nv)
              case (None, None) => None
            }
        }
      }
    }
    val rnd = new scala.util.Random(55)
    for (trial <- 0 until 10) {
      val vs = List.fill(30)(if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(20).toDouble))
      val parts = 1 + rnd.nextInt(6)
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", DoubleType, nullable = true)))
      val data = vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v.map(Double.box).orNull)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(data, parts), schema)
      val got = Table.fromDF(df, Seq(col("id"))).interpolate()
        .toDF.orderBy("id").select("v").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toList
      assert(got == model(vs), s"trial=$trial parts=$parts vs=$vs")
    }
  }

  test("zipIndexed assigns 0..n-1 exactly once at any partitioning") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 10) {
      val rows = randRows(rnd, 35)
      val parts = 1 + rnd.nextInt(7)
      val pairs = Table.fromDF(mkDf(rows, parts), Seq(col("iota"))).indexed
        .select("iota", Table.RowIdx).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pairs.values.toSeq.sorted == (0L until rows.size.toLong), s"trial=$trial")
      pairs.foreach { case (iota, idx) => assert(iota == idx, s"trial=$trial") }
    }
  }
}
