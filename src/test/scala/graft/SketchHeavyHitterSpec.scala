package graft

import graft.functions.MisraGries
import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: the candidate guarantee and the exact
  * two-pass operator, under adversarial partitionings. */
class SketchHeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: item i appears 2000/i times for i in 1..40 — items
  // 1..k-ish clear the n/k bar, the long tail does not
  private def zipf = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"item$i"))

  private def exactHH(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toDouble
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / k).toMap
  }

  test("candidate set contains every true heavy hitter under any partitioning") {
    val items = scala.util.Random.shuffle(zipf)
    val truth = exactHH(items, 10).keySet
    for (parts <- Seq(1, 3, 16, 64)) {
      val cands = items.toDF("it").repartition(parts)
        .agg(MisraGries.candidatesCol(col("it"), 10)).head()
        .getSeq[String](0).toSet
      assert(truth.subsetOf(cands), s"lost a heavy hitter at $parts partitions")
      assert(cands.size <= 9, s"sketch exceeded k-1 entries at $parts partitions")
    }
  }

  test("heavyHitters returns exactly the items with freq > n/k, any partitioning") {
    val items = scala.util.Random.shuffle(zipf)
    val want = exactHH(items, 12)
    for (parts <- Seq(2, 32)) {
      val got = Sketch.heavyHitters(items.toDF("it").repartition(parts), col("it"), 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    }
  }

  test("nulls are ignored; k larger than distinct count degrades to exact") {
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq(Some("c"), None, None)).toDF("it")
    // n (non-null) = 10; k=5 -> bar 2: a(6) and b(3) pass, c(1) does not
    val got = Sketch.heavyHitters(df, col("it"), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 6L, "b" -> 3L))
  }

  test("sketch state stays within k-1 entries on a wide-vocab stream") {
    // 5000 distinct singletons + one dominant item
    val items = (1 to 5000).map(i => s"u$i") ++ Seq.fill(3000)("big")
    val cands = items.toDF("it").repartition(8)
      .agg(MisraGries.candidatesCol(col("it"), 4)).head().getSeq[String](0)
    assert(cands.size <= 3)
    assert(cands.contains("big"))
  }
}
