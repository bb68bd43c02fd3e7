package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression => MlLogisticRegression}
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression => MlLinearRegression}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** ML bridge (reference: native_libs/learn/Learn.cpp:88-273, src/Learn Luna API)
  * re-expressed on spark.ml: the reference embeds CPython+sklearn for
  * LinearRegression / LogisticRegression(C) / oneHotEncode; here the same
  * surface runs distributed on the cluster — fit is a Spark job, predict a
  * narrow map.
  */
object Learn {

  /** Assemble feature columns into spark.ml's vector column; nulls are
    * rejected like the reference (numpy conversion errors on non-numeric,
    * NaNs propagate). */
  private def assemble(df: DataFrame, xs: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(xs.toArray)
      .setOutputCol("__features")
      .setHandleInvalid("skip")
      .transform(df)

  final case class FittedModel(transform: DataFrame => DataFrame, coefficients: Seq[Double],
      intercept: Double) {
    /** predictions as a column named `prediction` appended to the input. */
    def predict(df: DataFrame): DataFrame = transform(df)
  }

  /** OLS linear regression of y on xs (reference: Learn.cpp:96-118). */
  def linearRegression(df: DataFrame, xs: Seq[String], y: String): FittedModel = {
    val prepared = assemble(df, xs).withColumn("__label", col(y).cast(DoubleType))
    val m = new MlLinearRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(0.0) // plain OLS like sklearn's default LinearRegression
      .fit(prepared)
    FittedModel(
      d => m.transform(assemble(d, xs)).drop("__features"),
      m.coefficients.toArray.toSeq, m.intercept)
  }

  /** L2 logistic regression; C is sklearn's inverse regularization
    * (reference: Learn.cpp:120-141) -> regParam = 1/C (approx; sklearn
    * scales by n internally, we keep the simple reciprocal). */
  def logisticRegression(df: DataFrame, xs: Seq[String], y: String,
      c: Double = 1.0): FittedModel = {
    val prepared = assemble(df, xs).withColumn("__label", col(y).cast(DoubleType))
    val m = new MlLogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(1.0 / c)
      .fit(prepared)
    FittedModel(
      d => m.transform(assemble(d, xs)).drop("__features", "rawPrediction", "probability"),
      m.coefficients.toArray.toSeq, m.intercept)
  }

  /** R^2 score for regression / accuracy for classification — the
    * reference's `model.score` (Learn.cpp:143-151). */
  def r2Score(predictions: DataFrame, y: String): Double =
    new RegressionEvaluator().setLabelCol(y).setPredictionCol("prediction")
      .setMetricName("r2").evaluate(predictions.withColumn(y, col(y).cast(DoubleType)))

  def accuracy(predictions: DataFrame, y: String): Double =
    new MulticlassClassificationEvaluator().setLabelCol(y).setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(predictions.withColumn(y, col(y).cast(DoubleType)))

  /** One-hot encode a string column into one 0/1 double column per distinct
    * value, named `col: value`; null -> all zeros
    * (reference: Learn.cpp:230-273). Distinct values are collected once
    * (driver-side, bounded by cardinality) so output schema is stable. */
  def oneHotEncode(df: DataFrame, c: String): DataFrame = {
    val values = df.select(c).distinct().filter(col(c).isNotNull)
      .collect().map(_.getString(0)).sorted
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"$c: $v", when(col(c) === v, 1.0).otherwise(0.0))
    }
  }

  /** Feature scaling for numeric columns — the ML-prep narrow pass:
    * `zscore` ((x − mean)/std, population std like the reference's var)
    * or `minmax` ((x − min)/(max − min) onto [0, 1]). ONE partial-merged
    * aggregate computes every column's stats; the scale pass is
    * broadcast-literal arithmetic (no shuffle of the data). Stats are
    * rounded to 6 places before the division so outputs are
    * oracle-replayable despite summation-order noise (same rule as
    * Stats.zscores). Appends `<c>_scaled` per column; degenerate columns
    * (std or range 0) and null values scale to null. */
  def scaleFeatures(df: DataFrame, cols: Seq[String],
      method: String = "zscore"): DataFrame =
    scaleFeaturesMixed(df, cols.map(_ -> method))

  /** Mixed-method feature scaling in ONE stats scan: every (column,
    * method) pair's statistics travel in a single partial-merged
    * aggregate row, so a zscore-then-minmax prep chain pays one pass
    * over the data instead of one eager `.agg().head()` per call —
    * chained [[scaleFeatures]] calls were the slowest visible bench row
    * (each call is a sequential full scan; at 100 TB, each is a full
    * corpus read). Semantics identical to per-call scaling. */
  def scaleFeaturesMixed(df: DataFrame,
      specs: Seq[(String, String)]): DataFrame = {
    require(specs.nonEmpty)
    specs.foreach { case (c, m) =>
      require(Set("zscore", "minmax").contains(m), s"unknown method $m for $c") }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val aggs = specs.flatMap { case (c, method) =>
      // cast avg too: a DecimalType column's mean is BigDecimal otherwise
      if (method == "zscore")
        Seq(avg(col(c)).cast(DoubleType).as(s"${c}_m"),
          stddev_pop(col(c)).cast(DoubleType).as(s"${c}_s"))
      else Seq(min(col(c)).cast(DoubleType).as(s"${c}_m"),
        max(col(c)).cast(DoubleType).as(s"${c}_s"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    specs.zipWithIndex.foldLeft(df) { case (d, ((c, method), i)) =>
      // all-null column / empty input: stats are null -> the whole scaled
      // column is null (the documented degenerate rule), not a crash
      val scaled =
        if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(null).cast(DoubleType)
        else {
          val a = r6(row.getDouble(2 * i)); val b = r6(row.getDouble(2 * i + 1))
          method match {
            case "zscore" if b == 0.0 => lit(null).cast(DoubleType)
            case "zscore"             => (col(c).cast(DoubleType) - a) / b
            case _ if b - a == 0.0    => lit(null).cast(DoubleType)
            case _                    => (col(c).cast(DoubleType) - a) / (b - a)
          }
        }
      d.withColumn(s"${c}_scaled", scaled)
    }
  }

  /** PCA projection of an `array<float>` embedding column to `k`
    * dimensions (spark.ml, distributed covariance + local SVD on the
    * d×d matrix). The standard pre-ANN compression: project once, then
    * run [[graft.operators.Similarity]] search in the reduced space
    * (k·4 bytes/vec vs d·4 — shuffle and memory shrink d/k-fold, and
    * brute-force scoring speeds up the same factor). Returns the input
    * with `<out>` (array<float>, length k) plus the fitted model's
    * explained-variance vector for the caller to judge k. Fit on a
    * sample/batch once and reuse the returned transform for serving —
    * same split as the pinned-centroid flows. */
  def pcaProject(df: DataFrame, vecCol: String, k: Int,
      out: String = "pca_vec"): (DataFrame, Seq[Double]) = {
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val toArr = udf((v: org.apache.spark.ml.linalg.Vector) =>
      v.toArray.map(_.toFloat))
    val assembled = df.withColumn("__pca_in", toVec(col(vecCol)))
    val model = new org.apache.spark.ml.feature.PCA()
      .setInputCol("__pca_in").setOutputCol("__pca_out").setK(k)
      .fit(assembled)
    val projected = model.transform(assembled)
      .withColumn(out, toArr(col("__pca_out")))
      .drop("__pca_in", "__pca_out")
    (projected, model.explainedVariance.toArray.toSeq)
  }

  /** Hashed n-gram bag-of-words featurization (the fastText hashing
    * trick): each token n-gram buckets to fingerprint(gram) mod `dim`;
    * the feature vector is the per-bucket count. The 8-byte replayable
    * fingerprint keeps the whole pipeline engine-portable (an external
    * oracle can recompute every bucket). Shape: one explode collapses to
    * a (doc, bucket) partial-merged count — the shuffle carries ≤ dim
    * entries per doc, never gram text — then one map-assembly pass.
    * Docs with no n-gram (fewer than n tokens) produce no row. */
  def hashedNgramCounts(df: DataFrame, textCol: String, idCol: String,
      dim: Int, n: Int = 2): DataFrame = {
    import graft.operators.TextOps
    require(dim >= 2 && dim <= (1 << 20), s"hashedNgramCounts: dim $dim")
    val buckets = df.select(col(idCol),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("__g"))
      .select(col(idCol), (TextOps.fingerprint(col("__g")) % dim).cast("int").as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).cast(DoubleType).as("__c"))
    buckets.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c")))).as("__m"))
      .select(col(idCol), transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0.0))).as("features"))
  }

  /** Train a TEXT QUALITY CLASSIFIER (the CCNet/LLaMA-style "does this
    * look like reference text?" filter): logistic regression over
    * [[hashedNgramCounts]] features. Labels: 1.0 = keep-quality
    * exemplars (wiki/books), 0.0 = raw crawl. Returns (weights, bias)
    * sized `dim` — hand them to [[linearTextScore]] for the narrow
    * serving pass (the fit is one spark.ml job; scoring never touches
    * spark.ml). */
  def trainTextClassifier(df: DataFrame, textCol: String, labelCol: String,
      idCol: String, dim: Int = 256, n: Int = 2,
      c: Double = 1.0): (Array[Double], Double) = {
    import org.apache.spark.ml.functions.array_to_vector
    val feats = hashedNgramCounts(df, textCol, idCol, dim, n)
      .join(df.select(col(idCol), col(labelCol).cast(DoubleType).as("__label")), Seq(idCol))
      .withColumn("__features", array_to_vector(col("features")))
    val m = new MlLogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(1.0 / c)
      .fit(feats)
    (m.coefficients.toArray, m.intercept)
  }

  /** Serving-side linear text score: sigmoid(bias + Σ_grams
    * w[fingerprint(gram) mod dim]) — algebraically w·f for count
    * features, computed WITHOUT materializing the feature vector: one
    * weight-table lookup per gram, folded row-locally. Weights travel as
    * a plan literal; the pass is narrow (no shuffle, no spark.ml at
    * serving time) and every arithmetic step is oracle-replayable. */
  def linearTextScore(text: org.apache.spark.sql.Column, weights: Array[Double],
      bias: Double, n: Int = 2): org.apache.spark.sql.Column = {
    import graft.operators.TextOps
    val dim = weights.length
    val w = typedLit(weights)
    val grams = TextOps.shingles(TextOps.tokens(text), n)
    val z = aggregate(grams, lit(bias), (acc, g) =>
      acc + element_at(w, (TextOps.fingerprint(g) % dim).cast("int") + 1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Confusion matrix as a (label, prediction, count) table — declared but
    * unimplemented in the reference (Learn.cpp:153-159); trivial here. */
  def confusionMatrix(predictions: DataFrame, y: String): DataFrame =
    predictions.groupBy(col(y).cast(DoubleType).as("label"), col("prediction"))
      .agg(count(lit(1)).as("count"))
      .orderBy("label", "prediction")

  /** ROC AUC via the Mann–Whitney identity over GROUPED score buckets —
    * integer-exact and scale-safe: scores collapse to their distinct
    * values (bounded bucket table), concordant pairs come from a
    * bucket-level self-join on `a.score > b.score` (ties count half),
    * never a global rank window (a partition-less window materializes
    * the corpus on one task — the plan shape this repo bans). Returns
    * ONE row: `auc_num2` = 2·concordant + ties, `auc_den2` = 2·P·N, and
    * the half-up ppm — all BIGINT, so any SQL engine replays it exactly.
    * AUC = auc_num2 / auc_den2. */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val buckets = df.select(score.as("__s"), label.cast(BooleanType).as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__n0"))
    val a = buckets.select(col("__s").as("__sa"), col("__n1").as("__a1"),
      col("__n0").as("__a0"))
    val b = buckets.select(col("__s").as("__sb"), col("__n1").as("__b1"),
      col("__n0").as("__b0"))
    val conc = a.join(b, col("__sa") > col("__sb"))
      .agg(coalesce(sum(col("__a1") * col("__b0")), lit(0L)).as("__conc"))
    val ties = buckets
      .agg(coalesce(sum(col("__n1") * col("__n0")), lit(0L)).as("__ties"),
        sum(col("__n1")).as("__p"), sum(col("__n0")).as("__n"))
    conc.crossJoin(ties).select(
      (col("__conc") * 2 + col("__ties")).as("auc_num2"),
      (col("__p") * col("__n") * 2).as("auc_den2"),
      when(col("__p") > 0 && col("__n") > 0,
        // DECIMAL(38,0) headroom: num2 * 2e6 outgrows a long near sf100
        expr("CAST((CAST(__conc * 2 + __ties AS DECIMAL(38,0)) * 2000000" +
          " + __p * __n * 2) div (2 * (__p * __n * 2)) AS BIGINT)")).as("auc_ppm"))
  }

  /** Reliability (calibration) bins: equal-width score bins carrying the
    * exact positive counts — the grouped aggregate a calibration curve
    * plots. Integer outputs only (counts + half-up ppm positive rate),
    * fully oracle-replayable; one partial-merged aggregate. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"calibrationBins: need hi > lo, bins > 0")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((score - lo) / w), lit(0.0)), lit(bins - 1.0))
      .cast(LongType)
    // NaN scores: floor(NaN) is NaN, and under Spark's NaN-is-greatest
    // ordering least(greatest(NaN, 0), bins-1) lands in the TOP bin as
    // if measured — same guard as Stats.histogram
    df.where(!isnan(score.cast(DoubleType)))
      .select(bin.as("bin"), label.cast(BooleanType).as("__y"))
      .where(col("bin").isNotNull && col("__y").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate_ppm",
        expr("CAST((n_pos * 2000000 + n) div (2 * n) AS BIGINT)"))
  }
}
