package graft

import graft.functions.{InterpolatedQuantile, RankSelect}
import org.apache.spark.sql.functions._

/** The distributed exact-quantile path (iterative rank search) must be
  * bit-identical to the buffered [[InterpolatedQuantile]] aggregate —
  * same lerp rule, same NaN-last ordering — while never concentrating
  * the column in one task. */
class RankSelectSpec extends SparkSpec {
  import spark.implicits._

  private val QS = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.97)

  private def viaBuffer(df: org.apache.spark.sql.DataFrame, c: String,
      qs: Seq[Double]): Option[Seq[Double]] = {
    val r = df.agg(InterpolatedQuantile.quantilesCol(col(c), qs)).head()
    if (r.isNullAt(0)) None else Some(r.getSeq[Double](0).toList)
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, c: String,
      qs: Seq[Double] = QS): Unit = {
    val buffered = viaBuffer(df, c, qs)
    val ranked = RankSelect.quantilesOf(df, c, qs).map(_.toList)
    // bit-compare via Double.compare chains so NaN == NaN and 0.0 vs
    // -0.0 (numerically equal, both correct) doesn't flake
    (buffered, ranked) match {
      case (None, None) =>
      case (Some(b), Some(r)) =>
        assert(b.length === r.length)
        b.zip(r).zip(qs).foreach { case ((bv, rv), q) =>
          assert(java.lang.Double.compare(bv, rv) == 0 || bv == rv,
            s"q=$q buffered=$bv ranked=$rv")
        }
      case other => fail(s"presence mismatch: $other")
    }
  }

  test("matches the buffered aggregate on a deterministic mixed column") {
    val df = spark.range(100001).select(
      (sin(col("id") * 0.37) * 1e6 + col("id") % 97).as("x"))
    assertSame(df, "x")
  }

  test("duplicate-heavy column (90% one value) terminates and matches") {
    val df = spark.range(50000).select(
      when(col("id") % 10 =!= 0, lit(42.5))
        .otherwise(col("id").cast("double")).as("x"))
    assertSame(df, "x")
  }

  test("NaN and ±Inf tails follow the NaN-last sort order") {
    val base = spark.range(1000).select(col("id").cast("double").as("x"))
    val special = Seq(Double.NaN, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity).toDF("x")
    assertSame(base.unionByName(special), "x", Seq(0.001, 0.5, 0.995, 0.999))
  }

  test("sub-ULP neighbors separate exactly") {
    val v = 1.23456789e100
    val df = (Seq.fill(300)(v) ++ Seq.fill(300)(Math.nextUp(v)) ++
      Seq.fill(300)(Math.nextUp(Math.nextUp(v)))).toDF("x")
    assertSame(df, "x")
  }

  test("full-double-range span cannot overflow the bucket width") {
    val df = (Seq(-Double.MaxValue, Double.MaxValue) ++
      (1 to 500).map(i => math.pow(-1, i) * math.pow(10.0, (i % 600) - 300)))
      .toDF("x")
    assertSame(df, "x")
  }

  test("multi-column multi-q resolves in one shared pass sequence") {
    val df = spark.range(20000).select(
      (col("id") % 1000).cast("double").as("a"),
      (col("id") * 7919 % 104729).cast("double").as("b"))
    val got = RankSelect.quantiles(df, Seq("a" -> Seq(0.25, 0.5), "b" -> Seq(0.5, 0.9)))
    assert(got("a") === viaBuffer(df, "a", Seq(0.25, 0.5)).map(_.toList))
    assert(got("b") === viaBuffer(df, "b", Seq(0.5, 0.9)).map(_.toList))
  }

  test("all-null column returns None (the buffered aggregate's null)") {
    val df = spark.range(100).select(lit(null).cast("double").as("x"))
    assert(RankSelect.quantilesOf(df, "x", Seq(0.5)) === None)
  }

  test("many interval groups (>16) route through the explode fallback and match") {
    // 20 columns with one quantile each = 20 active (column, interval)
    // groups on pass 1 — past the union-branch cap, so the single-scan
    // explode histogram runs; both paths must agree with the buffered
    // aggregate bit for bit
    val cols = (0 until 20).map(i => s"c$i")
    val df = spark.range(30000).select(cols.zipWithIndex.map { case (c, i) =>
      ((col("id") * (7919 + i) % 10007).cast("double") +
        sin(col("id") * (0.11 + i)).multiply(100.0)).as(c)
    }: _*)
    val got = RankSelect.quantiles(df, cols.map(c => c -> Seq(0.37)))
    cols.foreach { c =>
      assert(got(c) === viaBuffer(df, c, Seq(0.37)).map(_.toList), c)
    }
  }

  test("weighted quantiles: inverted CDF vs a brute-force model, ties and dead weights") {
    // deterministic values with heavy ties; weights include nulls and
    // zeros (no mass) and a dominant heavy row
    val rows = (0 until 5000).map { i =>
      val x = (i % 37).toDouble
      val w: java.lang.Long =
        if (i % 11 == 0) null
        else if (i % 7 == 0) 0L
        else ((i % 5) + 1).toLong
      (x, w)
    } :+ ((99.0, java.lang.Long.valueOf(40000L))) // one row owns most mass
    val df = rows.toDF("x", "w")
    val qs = Seq(0.1, 0.5, 0.66, 0.9, 1.0)
    val got = RankSelect.weightedQuantiles(df, Seq("x" -> qs), "w")("x").get
    // brute force: sort by value, walk cumulative weight
    val live = rows.collect { case (x, w) if w != null && w > 0 => (x, w.longValue) }
      .sortBy(_._1)
    val tot = live.map(_._2).sum
    def brute(q: Double): Double = {
      val r = math.ceil(q * tot.toDouble).toLong
      var cum = 0L
      live.find { case (_, w) => cum += w; cum >= r }.get._1
    }
    qs.zip(got).foreach { case (q, v) => assert(v === brute(q), s"q=$q") }
    // the heavy row dominates: the weighted median is 99 even though
    // 5000 of 5001 rows are below it
    assert(got(1) === 99.0)
    // a column with no positive-weight rows is None
    assert(RankSelect.weightedQuantiles(
      df.withColumn("w", lit(0L)), Seq("x" -> Seq(0.5)), "w")("x") === None)
  }

  test("10M rows: exact against closed form, no single-task column buffer") {
    // values are a permutation of 0..N-1 (multiplication by an odd
    // constant mod 2^k is a bijection), so every order statistic is
    // known in closed form; the buffered aggregate at this size would
    // hold all 10M doubles in ONE task's merge buffer — RankSelect's
    // per-task state stays O(targets × 4096) counters by construction
    val n = 10_000_000L
    val df = spark.range(n).select(
      ((col("id") * 115249L) % n).cast("double").as("x"))
    val qs = Seq(0.25, 0.5, 0.9)
    val got = RankSelect.quantilesOf(df, "x", qs).get
    qs.zip(got).foreach { case (q, v) =>
      val x = n * q - 0.5
      val expect = (1 - (x - math.floor(x))) * math.floor(x) +
        (x - math.floor(x)) * math.ceil(x)
      assert(v === expect, s"q=$q")
    }
  }

  test("pass cache is unpersisted after every entry point (no storage leak)") {
    // the cached column projection that passes scan must not outlive the
    // call — a long-lived session running describe() per table would
    // otherwise accumulate pinned blocks until GC thrash
    spark.catalog.clearCache()
    val df = spark.range(100000).select(
      (col("id") % 997).cast("double").as("x"), (col("id") % 7 + 1).as("w"))
    RankSelect.quantilesOf(df, "x", Seq(0.5, 0.9))
    RankSelect.orderStatistics(df, Seq("x" -> Seq(3L, 77777L)))
    RankSelect.weightedQuantiles(df, Seq("x" -> Seq(0.5)), "w")
    // unpersist(blocking=false) is async; poll briefly
    def pinned() = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.nanoTime() + 10_000_000_000L
    while (pinned() > 0 && System.nanoTime() < deadline) Thread.sleep(100)
    assert(pinned() === 0, "RankSelect left cached blocks behind")
  }
}
