package graft

import graft.ml.Learn
import org.apache.spark.sql.functions._

/** ML bridge on spark.ml (reference sklearn semantics). */
class LearnSpec extends SparkSpec {

  test("linear regression recovers a known linear relationship") {
    import spark.implicits._
    // y = 3x + 2 exactly
    val df = (0 until 50).map(i => (i.toDouble, 3.0 * i + 2.0)).toDF("x", "y")
    val m = Learn.linearRegression(df, Seq("x"), "y")
    assert(math.abs(m.coefficients.head - 3.0) < 1e-6)
    assert(math.abs(m.intercept - 2.0) < 1e-6)
    val score = Learn.r2Score(m.predict(df), "y")
    assert(score > 0.999999)
  }

  test("logistic regression separates a simple threshold") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toDouble, if (i >= 50) 1.0 else 0.0)).toDF("x", "y")
    val m = Learn.logisticRegression(df, Seq("x"), "y", c = 10.0)
    val acc = Learn.accuracy(m.predict(df), "y")
    assert(acc > 0.95)
    val cm = Learn.confusionMatrix(m.predict(df), "y").collect()
    assert(cm.map(_.getLong(2)).sum == 100L)
  }

  test("oneHotEncode: one 0/1 double column per value, null -> all zeros") {
    import spark.implicits._
    val df = Seq((1L, "red"), (2L, "blue"), (3L, null.asInstanceOf[String]))
      .toDF("id", "color")
    val out = Learn.oneHotEncode(df, "color")
    assert(out.columns.toSet.contains("color: red"))
    assert(out.columns.toSet.contains("color: blue"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Double]("color: red") == 1.0)
    assert(rows(0).getAs[Double]("color: blue") == 0.0)
    assert(rows(2).getAs[Double]("color: red") == 0.0) // null row all zeros
    assert(rows(2).getAs[Double]("color: blue") == 0.0)
  }

  test("scaleFeatures: hand-computed zscore/minmax, degenerate columns null") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("v", "c")
    val z = Learn.scaleFeatures(df, Seq("v", "c"), "zscore")
      .orderBy("v").collect()
    // std_pop([1,2,3]) = sqrt(2/3) -> rounded 0.816497
    assert(math.abs(z(0).getAs[Double]("v_scaled") - (1.0 - 2.0) / 0.816497) < 1e-12)
    assert(z.forall(_.isNullAt(3))) // constant column -> null
    val m = Learn.scaleFeatures(df, Seq("v"), "minmax").orderBy("v").collect()
    assert(m(1).getAs[Double]("v_scaled") == 0.5)
    assert(m(0).getAs[Double]("v_scaled") == 0.0 && m(2).getAs[Double]("v_scaled") == 1.0)
  }

  test("scaleFeatures: all-null and empty inputs give a null scaled column") {
    import spark.implicits._
    val allNull = Seq[java.lang.Double](null, null).toDF("x")
    val out = graft.ml.Learn.scaleFeatures(allNull, Seq("x"))
      .select("x_scaled").collect()
    assert(out.forall(_.isNullAt(0)))
    val empty = Seq.empty[Double].toDF("x")
    assert(graft.ml.Learn.scaleFeatures(empty, Seq("x")).count() == 0)
  }

  test("hashedNgramCounts: buckets are fingerprint mod dim, counts exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = Learn.hashedNgramCounts(df, "text", "doc_id", dim = 16, n = 2)
      .head().getSeq[Double](1)
    assert(out.length == 16 && out.sum == 4.0) // 4 bigrams total
    // "a b" occurs twice -> its bucket holds >= 2
    val fp = df.sparkSession.range(1)
      .select(graft.operators.TextOps.fingerprint(lit("a b")) % 16).head().getLong(0)
    assert(out(fp.toInt) >= 2.0)
  }

  test("text classifier: trained weights separate planted good/bad docs; " +
      "linearTextScore equals the explicit dot product") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val good = (0L until 40L).map(i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog", 1.0))
    val bad = (100L until 140L).map(i =>
      (i, "buy now click here buy now click here buy now", 0.0))
    val df = (good ++ bad).toDF("doc_id", "text", "label")
    val (w, b) = Learn.trainTextClassifier(df, "text", "label", "doc_id",
      dim = 64, n = 2)
    assert(w.length == 64)
    val scored = df.select(col("label"),
        Learn.linearTextScore(col("text"), w, b, n = 2).as("s")).collect()
    assert(scored.filter(_.getDouble(0) == 1.0).forall(_.getDouble(1) > 0.5))
    assert(scored.filter(_.getDouble(0) == 0.0).forall(_.getDouble(1) < 0.5))
    // differential: the fold-form score equals sigmoid(b + w . f)
    val one = df.filter(col("doc_id") === 0L)
    val f = Learn.hashedNgramCounts(one, "text", "doc_id", 64, 2)
      .head().getSeq[Double](1)
    val z = b + w.zip(f).map { case (wi, fi) => wi * fi }.sum
    val direct = 1.0 / (1.0 + math.exp(-z))
    val fold = one.select(Learn.linearTextScore(col("text"), w, b, 2))
      .head().getDouble(0)
    assert(math.abs(fold - direct) < 1e-9, s"$fold vs $direct")
  }

  test("pcaProject: planar 3D data collapses to 2 components with ~all variance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // points live in the z ~ 0 plane: two strong axes + 1e-3 z noise
    val pts = (0L until 200L).map { i =>
      val a = rnd.nextGaussian().toFloat; val b = rnd.nextGaussian().toFloat
      (i, Array(a + b, a - b, (rnd.nextGaussian() * 1e-3).toFloat))
    }.toDF("vec_id", "embedding")
    val (projected, variance) = Learn.pcaProject(pts, "embedding", 2)
    assert(variance.length == 2 && variance.sum > 0.999, s"variance $variance")
    val row = projected.select("pca_vec").head().getSeq[Float](0)
    assert(row.length == 2)
    // projection preserves pairwise structure: distances in the plane
    val two = projected.orderBy("vec_id").select("embedding", "pca_vec")
      .limit(2).collect()
    def d(a: Seq[Float], b: Seq[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val dOrig = d(two(0).getSeq[Float](0), two(1).getSeq[Float](0))
    val dProj = d(two(0).getSeq[Float](1), two(1).getSeq[Float](1))
    assert(math.abs(dOrig - dProj) < 1e-2, s"$dOrig vs $dProj")
  }

  test("aucExact: hand-computed Mann-Whitney with ties; degenerate guards") {
    import spark.implicits._
    // scores 1,2,2,3; labels F,F,T,T: 3 concordant pairs + 1 tie of 4
    // -> AUC = 3.5/4 = 0.875
    val df = Seq((1, false), (2, false), (2, true), (3, true)).toDF("s", "y")
    val r = Learn.aucExact(df, col("s"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((7L, 8L, 875000L)))
    // perfect separation -> AUC 1; anti-separation -> 0
    val perfect = Seq((1, false), (2, true)).toDF("s", "y")
    assert(Learn.aucExact(perfect, col("s"), col("y")).head().getLong(2) === 1000000L)
    val anti = Seq((2, false), (1, true)).toDF("s", "y")
    assert(Learn.aucExact(anti, col("s"), col("y")).head().getLong(2) === 0L)
    // one-class input: ppm is null, not a division error
    val oneClass = Seq((1, true), (2, true)).toDF("s", "y")
    assert(Learn.aucExact(oneClass, col("s"), col("y")).head().isNullAt(2))
    // no global window / no corpus-wide rank in the plan
    val plan = Learn.aucExact(df, col("s"), col("y"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number") && !plan.contains("Window"), plan)
  }

  test("calibrationBins: exact counts, clamping, half-up ppm") {
    import spark.implicits._
    val df = Seq((0.05, true), (0.05, false), (0.05, false), // bin 0: 1/3
      (0.55, true), (0.55, true),                            // bin 5: 2/2
      (1.7, false)                                           // clamps to bin 9
    ).toDF("s", "y")
    val bins = Learn.calibrationBins(df, col("s"), col("y"), 0.0, 1.0, 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.toSeq === Seq((0L, 3L, 1L, 333333L), (5L, 2L, 2L, 1000000L),
      (9L, 1L, 0L, 0L)))
    // NaN scores are unmeasured, not "greatest": without the guard,
    // floor(NaN) + NaN-is-greatest ordering would clamp them into the
    // TOP bin as if they were real observations (Stats.histogram's rule)
    val withNaN = Seq((0.95, true), (Double.NaN, true), (Double.NaN, false))
      .toDF("s", "y")
    val top = Learn.calibrationBins(withNaN, col("s"), col("y"), 0.0, 1.0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq === Seq((9L, 1L, 1L)))
  }
}
