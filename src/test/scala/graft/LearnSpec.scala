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
}
