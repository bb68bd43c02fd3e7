package graft.operators

import graft.core.Table
import graft.functions.InterpolatedQuantile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-column statistics, correlation, countValues, describe
  * (reference: native_libs/src/Analysis.cpp:89-526, src/Table.luna:1096-1361).
  * All single-pass distributed aggregates — one job, no collects.
  */
object Stats {

  /** min/max/mean/sum/var_pop/std_pop/median/quantile/countMissing for one
    * column as a 1-row DataFrame. Population variance, >=2-sample gate,
    * sum()=0 on empty — same contract as Aggregates. */
  def describeColumn(df: DataFrame, c: String): DataFrame = {
    val x = col(c)
    // ungrouped quantiles go through the distributed rank search — the
    // buffered aggregate run whole-column would merge every value into
    // ONE task's buffer (see graft.functions.RankSelect)
    val qs = graft.functions.RankSelect.quantilesOf(df, c, Seq(0.25, 0.5, 0.75))
    def q(i: Int): Column =
      qs.map(v => lit(v(i))).getOrElse(lit(null)).cast(DoubleType)
    df.agg(
      min(x).cast(DoubleType).as("min"),
      max(x).cast(DoubleType).as("max"),
      avg(x).as("mean"),
      coalesce(sum(x), lit(0)).cast(DoubleType).as("sum"),
      when(count(x) >= 2, var_pop(x)).as("variance"),
      when(count(x) >= 2, stddev_pop(x)).as("std"),
      (count(lit(1)) - count(x)).as("null_count"),
      count(lit(1)).as("row_count"))
    .select(col("min"), col("max"), col("mean"), col("sum"), col("variance"),
      col("std"),
      q(0).as("q1"), q(1).as("median"), q(2).as("q3"),
      col("null_count"), col("row_count"))
  }

  /** Whole-table describe (reference: src/Table.luna:1321-1361): one row
    * per numeric column with Mean/Std/Min/Q.25/Median/Q.75/Max. A single
    * aggregation job computes all 7*n aggregates; the tiny reshape to
    * one-row-per-column happens driver-side. */
  def describe(df: DataFrame): DataFrame = {
    val nums = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    require(nums.nonEmpty,
      "describe: input has no numeric columns (use describeNa for null profiling)")
    val aggs = nums.flatMap { c =>
      val x = col(c)
      // avg of a DecimalType returns BigDecimal — cast so the hand-built
      // DoubleType output schema holds for every NumericType
      Seq(avg(x).cast(DoubleType).as(s"${c}__mean"),
        when(count(x) >= 2, stddev_pop(x)).as(s"${c}__std"),
        min(x).cast(DoubleType).as(s"${c}__min"),
        max(x).cast(DoubleType).as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // ALL columns' q1/median/q3 resolve in ONE shared rank-search pass
    // sequence — never a whole-column buffer in one task (RankSelect)
    val quart = graft.functions.RankSelect.quantiles(df,
      nums.map(c => c -> Seq(0.25, 0.5, 0.75)))
    val spark = df.sparkSession
    val out = nums.zipWithIndex.map { case (c, i) =>
      val base = i * 4
      def q(j: Int): Any = quart(c).map(_(j)).orNull
      org.apache.spark.sql.Row.fromSeq(Seq(c,
        row.get(base), row.get(base + 1), row.get(base + 2),
        q(0), q(1), q(2), row.get(base + 3)))
    }
    val schema = StructType(StructField("column", StringType) +:
      Seq("mean", "std", "min", "q1", "median", "q3", "max")
        .map(StructField(_, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }

  /** value -> occurrence count (nulls counted as a group too), reference
    * emits hash order; we leave order to the caller (sort for determinism).
    * Reference: Analysis.cpp:40-77. */
  def countValues(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c).as("value")).agg(count(lit(1)).as("count"))

  /** HyperLogLog++ approximate distinct counts (beyond the reference) —
    * THE cardinality sketch for 100 TB profiling: fixed ~kilobyte state
    * per column regardless of cardinality, partial-merged map-side, one
    * tiny shuffle; exact countDistinct at that scale shuffles every
    * distinct value. `rsd` = target relative standard deviation.
    * Sketch output is implementation-defined, so this is spec-verified
    * (error bound vs exact), not oracle-hashed. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "approxDistinct: no columns given")
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_approx_nd"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_approx_nd")): _*)
  }

  /** Shannon entropy (bits) of each column's value distribution — the
    * profiling signal for degenerate columns (0 = constant), skewed
    * label/source mixes, and near-unique keys (≈ log2 n). Nulls form
    * their own category, like countValues. One row per column:
    * (column, entropy). Per column: one partial-merged groupBy count +
    * one scalar aggregate over the (cardinality-sized) count table —
    * H = log2(N) − Σ n·log2(n) / N, so no per-row p=n/N division pass.
    * High-cardinality columns pay their cardinality in the count table
    * (use [[approxDistinct]] first to spot those). */
  def entropies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "entropies: at least one column")
    cols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .agg(
          lit(c).as("column"),
          (log2(sum(col("__n"))) -
            sum(col("__n") * log2(col("__n"))) / sum(col("__n"))).as("entropy"))
    }.reduce(_ unionByName _)
  }

  /** Per-key z-scores — the grouped outlier/anomaly signal. Key stats go
    * through one partial-merged aggregate and join back (AQE broadcasts
    * when the key table is small — the usual case; a window over the key
    * would materialize whole partitions for two scalars). Mean/std are
    * rounded to 6 places BEFORE the division so the z values are
    * bit-replayable by an SQL oracle despite summation-order noise.
    * z is null where std == 0 (degenerate groups) or the value is null. */
  def zscores(df: DataFrame, valCol: String, keyCols: Seq[String]): DataFrame = {
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(round(avg(col(valCol)), 6).as("__mean"),
        round(stddev_pop(col(valCol)), 6).as("__std"))
    // null-SAFE join back: groupBy keeps the null-key group, and a plain
    // equi-join would silently drop its rows instead of scoring them
    val statsR = keyCols.foldLeft(stats)((d, k) => d.withColumnRenamed(k, s"__zk_$k"))
    val cond = keyCols.map(k => col(k) <=> col(s"__zk_$k")).reduce(_ && _)
    df.join(statsR, cond, "left")
      .withColumn("z",
        when(col("__std") > 0, (col(valCol) - col("__mean")) / col("__std")))
      .drop(keyCols.map(k => s"__zk_$k") :+ "__mean" :+ "__std": _*)
  }

  /** Fixed-range numeric histogram: `bins` equal-width buckets over
    * [lo, hi); out-of-range values clamp into the edge bins, nulls drop.
    * One narrow projection + one tiny map-side-combined aggregate — the
    * distribution diagnostic that costs a single pass at any scale
    * (contrast an exact quantile's sort). Bin arithmetic is plain IEEE
    * floor((x-lo)/w), bit-replayable by any SQL engine. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need hi > lo and bins > 0: [$lo, $hi) / $bins")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(c) - lo) / w), lit(0.0)), lit(bins - 1.0))
      .cast(LongType)
    // NaN would otherwise ride greatest/least's NaN-is-greatest ordering
    // into the top bin looking like a legitimate count — drop like null
    df.filter(col(c).isNotNull && !isnan(col(c).cast(DoubleType)))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-depth binning: `bins` buckets split at the EXACT interpolated
    * quantiles (i/bins, the reference's n = N·q − 0.5 lerp rule) —
    * length-balanced bucketing for curriculum schedules / balanced eval
    * slices. Two passes: one tiny partial-merged quantile aggregate
    * (bins−1 doubles to the driver), then a narrow fold-of-whens bucket
    * projection (codegen'd; values equal to a boundary go to the lower
    * bin, nulls get a null bin). Never a global sort/ntile — the
    * boundaries make the second pass embarrassingly parallel. */
  def equiDepthBins(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 2, s"need bins >= 2: $bins")
    // boundaries via distributed rank search (whole-column exact
    // quantiles without a single-task buffer — RankSelect)
    val bounds = graft.functions.RankSelect.quantilesOf(df, c,
        (1 until bins).map(_.toDouble / bins))
      .getOrElse(throw new IllegalArgumentException(
        s"equiDepthBins: '$c' has no non-null values — boundaries undefined"))
    val bin = bounds.map(b => when(col(c) > b, 1L).otherwise(0L)).reduce(_ + _)
    // NaN > b is true for every boundary -> it would land in the top bin
    // as if measured; give it the null bin like null
    df.withColumn("bin",
      when(col(c).isNotNull && !isnan(col(c).cast(DoubleType)), bin))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard distribution-drift monitor run between corpus
    * versions (quality scores, doc lengths, source mixes):
    * PSI = Σ_bins (p_cur − p_ref)·ln(p_cur / p_ref), with the bin grid
    * FIXED from the reference snapshot's exact equi-depth quantiles
    * (the reference's N·q − 0.5 lerp rule), so the metric is comparable
    * release-over-release. Rule of thumb: < 0.1 stable, 0.1–0.25 drift
    * worth a look, > 0.25 action. Probabilities are add-half smoothed
    * ((n + 0.5) / (N + bins/2)) so empty bins stay defined, rounded
    * to 6 decimals BEFORE the log so an SQL oracle replays bit-exactly,
    * and floored at 1e-6 so the rounding can't underflow an empty bin's
    * probability to zero at large N.
    *
    * Output: one row per bin (bin, n_ref, n_cur, p_ref, p_cur,
    * psi_term); total PSI = sum(psi_term). Scale shape: one bounded
    * quantile aggregate over the reference + one partial-merged bin
    * count per side (boundaries travel as literals — the corpus is
    * never sorted); the bins-sized join/spine is driver-trivial. */
  def driftPsi(ref: DataFrame, cur: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 2, s"driftPsi: need bins >= 2, got $bins")
    import graft.functions.InterpolatedQuantile
    // NaN is dropped like null (matching histogram/equiDepthBins/winsorize):
    // under Spark's NaN-is-greatest ordering a NaN would pass every `> bound`
    // comparison and silently inflate the top bin as if it were measured data.
    val measured = col(c).isNotNull && !isnan(col(c).cast(DoubleType))
    val bounds = graft.functions.RankSelect.quantilesOf(ref.filter(measured),
        c, (1 until bins).map(_.toDouble / bins))
      .getOrElse(throw new IllegalArgumentException(
        s"driftPsi: reference '$c' has no non-null values — grid undefined"))
    def binned(df: DataFrame, out: String) = {
      val b = bounds.map(bd => when(col(c) > bd, 1L).otherwise(0L)).reduce(_ + _)
      df.filter(measured).select(b.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    }
    val spine = ref.sparkSession.range(bins).select(col("id").as("bin"))
    val joined = spine
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .localCheckpoint() // bins-sized; totals derive from the SAME counts
    val tot = joined.agg(sum(col("n_ref")), sum(col("n_cur"))).head()
    val (nr, nc) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
    // the 1e-6 floor keeps the rounded probability positive at any N —
    // above ~1M rows the smoothed p of an empty bin would round to 0.0
    // and ln(0) would null out exactly the most-drifted bin's term
    def p(n: Column, total: Double) =
      greatest(round((n.cast(DoubleType) + 0.5) / (total + bins * 0.5), 6),
        lit(1e-6))
    joined
      .withColumn("p_ref", p(col("n_ref"), nr))
      .withColumn("p_cur", p(col("n_cur"), nc))
      .withColumn("psi_term",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
  }

  /** groupBy/join SKEW diagnosis for a key set — the operational
    * pre-flight for any 100 TB shuffle: the `topK` heaviest keys with
    * row count, corpus share, and `x_mean` = count / mean-key-load. A
    * reducer processing the hot key runs ~x_mean× the average task, and
    * ceil(x_mean) is the salt factor that would flatten it (feed to
    * [[graft.operators.Joins.saltedJoin]]); AQE's skew-join handles the
    * join case at runtime, this makes the aggregation case visible
    * before it burns a stage. One partial-merged groupBy (pinned so the
    * totals derive from the SAME pass) + a tiny top-k. Ties break by the
    * key columns ascending. */
  def skewReport(df: DataFrame, keyCols: Seq[String], topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && topK > 0)
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val tot = counts.agg(sum(col("n")), count(lit(1))).head()
    if (tot.isNullAt(0)) // empty input: no keys, empty report (not an NPE)
      return counts.withColumn("share", lit(0.0)).withColumn("x_mean", lit(0.0))
    val (total, nKeys) = (tot.getLong(0), tot.getLong(1))
    val mean = total.toDouble / nKeys
    counts
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
      .withColumn("share", col("n").cast(DoubleType) / total)
      .withColumn("x_mean", col("n").cast(DoubleType) / mean)
  }

  /** Winsorize: clamp a numeric column at its exact interpolated
    * `[lo, hi]` quantiles (the REFERENCE quantile rule, n = N·q − 0.5 +
    * lerp — graft.functions.InterpolatedQuantile). One partial-merged
    * aggregate computes BOTH bounds (scan 1), then the clamp is a narrow
    * broadcast-literal pass (scan 2) — no sort, no shuffle of the data.
    * Nulls stay null. Appends `<col>_wins` (double). */
  def winsorize(df: DataFrame, c: String, lo: Double = 0.01,
      hi: Double = 0.99): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0, s"need 0 <= lo < hi <= 1: $lo, $hi")
    val bounds = graft.functions.RankSelect.quantilesOf(df, c, Seq(lo, hi))
      .getOrElse(throw new IllegalArgumentException(
        s"winsorize: '$c' has no non-null values"))
    val (l, h) = (bounds(0), bounds(1))
    // NaN must pass through unclamped — greatest/least's NaN-is-greatest
    // ordering would silently rewrite it to the hi bound
    val x = col(c).cast(DoubleType)
    df.withColumn(s"${c}_wins",
      when(isnan(x), x).otherwise(least(greatest(x, lit(l)), lit(h))))
  }

  /** Robust outlier flagging via median/MAD: robust z = 0.6745·(x − med) /
    * MAD with MAD = median(|x − med|), both by the exact interpolated-
    * quantile rule. Two tiny sequential aggregates (MAD needs the median
    * first) + one narrow flag pass; the data is never sorted or shuffled.
    * The 0.6745 factor (Φ⁻¹(0.75)) makes robust z comparable to a normal
    * z-score. `robust_z` is null for null values and for degenerate
    * columns (MAD = 0); `is_outlier` = |robust z| > cut (Iglewicz &
    * Hoaglin's 3.5 by default). Median/MAD are rounded to 6 places before
    * the division so the z values are bit-replayable by an SQL oracle. */
  def madOutliers(df: DataFrame, c: String, cut: Double = 3.5): DataFrame = {
    import graft.functions.RankSelect
    val med = BigDecimal(
        RankSelect.quantilesOf(df, c, Seq(0.5))
          .getOrElse(throw new IllegalArgumentException(
            s"madOutliers: '$c' has no non-null values"))(0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mad = BigDecimal(
        RankSelect.quantilesOf(
          df.select(abs(col(c).cast(DoubleType) - med).as("__dev")),
          "__dev", Seq(0.5)).get(0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = if (mad == 0.0) lit(null).cast(DoubleType)
      else lit(0.6745) * (col(c).cast(DoubleType) - med) / mad
    df.withColumn("robust_z", z)
      .withColumn("is_outlier", when(col("robust_z").isNotNull,
        abs(col("robust_z")) > cut))
  }

  /** Per-column null count + ratio (reference: src/Table.luna:1096-1105). */
  def describeNa(df: DataFrame): DataFrame = {
    require(df.columns.nonEmpty, "describeNa: input has no columns")
    val aggs = df.columns.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
          ((count(lit(1)) - count(col(c))).cast(DoubleType) / count(lit(1))).as(s"${c}_null_ratio"))
    }
    df.agg(aggs.head, aggs.tail.toSeq: _*)
  }

  /** Pairwise-complete Pearson correlation of two columns — `corr` ignores
    * rows where either side is null, matching the reference's
    * iterateOverJustPairs (Analysis.cpp:415-519). */
  def correlation(df: DataFrame, a: String, b: String): Column = corr(col(a), col(b))

  /** Full correlation matrix over the numeric columns: one row per column,
    * one output col per column — single aggregation job of n^2/2 corr
    * aggregates (fine for the reference's column counts; a 100k-column
    * matrix would switch to RowMatrix.computeCovariance). */
  def correlationMatrix(df: DataFrame): DataFrame = {
    val nums = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    require(nums.nonEmpty, "correlationMatrix: input has no numeric columns")
    val aggs = for (a <- nums; b <- nums) yield corr(col(a), col(b)).as(s"${a}__$b")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // reshape driver-side: tiny (n_cols^2 values)
    val row = wide.collect()(0)
    val spark = df.sparkSession
    val data = nums.zipWithIndex.map { case (a, i) =>
      org.apache.spark.sql.Row.fromSeq(a +: nums.indices.map(j => row.get(i * nums.length + j)))
    }
    val schema = StructType(StructField("column", StringType) +: nums.map(StructField(_, DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** corr of each numeric column against `target`, sorted by value
    * (reference: src/Table.luna:1164-1170). */
  def correlationsWith(df: DataFrame, target: String): DataFrame = {
    val nums = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    require(nums.nonEmpty, "correlationsWith: input has no numeric columns")
    val aggs = nums.map(c => corr(col(c), col(target)).as(c))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val row = wide.collect()(0)
    val spark = df.sparkSession
    val data = nums.zipWithIndex.map { case (c, i) => org.apache.spark.sql.Row(c, row.get(i)) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1),
      StructType(Seq(StructField("column", StringType), StructField("corr", DoubleType))))
      .orderBy(col("corr"))
  }

  /** Pearson corr of a column vs itself shifted by `lag` rows
    * (reference: Analysis.cpp:521-526; pandas-validated tests
    * Tests.cpp:1091-1106). Rides [[Table.shift]]'s blocked window — no
    * single-partition WindowExec — then one scalar corr aggregate. */
  def autoCorr(table: Table, c: String, lagN: Int): DataFrame =
    table.shift(c, lagN).df
      .agg(corr(col(c), col(s"${c}_shift_$lagN")).as("autocorr"))

  /** Rolling time-interval aggregation (reference: Analysis.cpp:732-918):
    * for each row, window = rows with key in (key_r - interval, key_r]
    * (LEFT-OPEN) — expressed as rangeBetween(-(interval-1unit), 0) over the
    * key as int64 (timestamps use microseconds). Integer-granularity keys
    * only: double keys are rejected (the long cast would truncate and the
    * `-(interval-1)` left-open trick assumes unit granularity).
    *
    * Scale shape: a bare `Window.orderBy(key)` is ONE partition. Instead
    * the key axis is cut into spans of `interval` units; each row is also
    * ghost-copied into the next span iff its lookback consumers reach it
    * (<=2x duplication), the range window runs per span, and only home-span
    * rows are kept. One hash shuffle, parallel at any scale. RANGE frames
    * are value-based, so equal keys land in the same span and every row's
    * result is identical to the global-window plan.
    *
    * Degenerate case, stated honestly: parallelism = keyRange/interval
    * spans, so an interval comparable to the whole key range collapses to
    * few spans — inherent, since every window then depends on most of the
    * table. For such "almost-global" aggregations prefer the keyed variant
    * or a plain groupBy. */
  def rollingInterval(
      df: DataFrame,
      key: String,
      intervalMicros: Long,
      specs: Seq[(String, Seq[Aggregates.AggFn])]): DataFrame = {
    require(intervalMicros > 0, // <= 0 inverts the rangeBetween frame and
      s"rollingInterval: interval must be > 0, got $intervalMicros") // the ghost spans
    val ord = rollingOrd(df, key)
    val span = math.max(intervalMicros, 1L)
    val d = df.withColumn("__ord", ord)
      // floor division via exact integer arithmetic (negative keys safe;
      // no double division — micros epochs are near the 2^53 exactness edge)
      .withColumn("__home", expr(s"(__ord - ((__ord % $span + $span) % $span)) div $span"))
      .withColumn("__reach", expr(
        s"(__ord + ${intervalMicros - 1}) - (((__ord + ${intervalMicros - 1}) % $span + $span) % $span)"))
      .withColumn("__blk", explode(sequence(col("__home"), expr(s"__reach div $span"))))
    val w = Window.partitionBy(col("__blk")).orderBy(col("__ord"))
      .rangeBetween(-(intervalMicros - 1), 0)
    val winCols = specs.flatMap { case (c, fns) =>
      fns.map(fn => windowed(fn, col(c), w).as(s"${c}_${fn.fnName}"))
    }
    d.select((col(key) +: col("__blk") +: col("__home") +: winCols): _*)
      .filter(col("__blk") === col("__home"))
      .drop("__blk", "__home")
  }

  /** Key column as int64 for rolling windows; rejects fractional types
    * (reference accepts int64/timestamp keys at unit granularity —
    * Analysis.cpp:764-780). */
  private def rollingOrd(df: DataFrame, key: String): Column =
    df.schema(key).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(key).cast(TimestampType))
      case ByteType | ShortType | IntegerType | LongType | DateType => col(key).cast(LongType)
      case other => throw new IllegalArgumentException(
        s"rollingInterval: key '$key' has non-integral type $other; " +
          "use an int64 or timestamp key (unit granularity)")
    }

  /** Gap-based sessionization, batch form: a session breaks when the gap
    * to the previous event (per key) exceeds `gapMicros`. The lag+cumsum
    * composition is the portable equivalent of streaming session_window —
    * one shuffle on the key, then two narrow window passes. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val ts = unix_micros(col(tsCol).cast(TimestampType))
    val order = ts +: tieBreak // tie-break makes ROWS frames deterministic
    val wOrder = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val newSession = when(
      ts - lag(ts, 1).over(wOrder) > gapMicros || lag(ts, 1).over(wOrder).isNull, 1L)
      .otherwise(0L)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("session_id", sum(newSession).over(wRun))
  }

  /** Per-group least-squares trend: slope/intercept of y over x per
    * group — drift profiling ("is this source's quality score sinking
    * over time?"). The ANSI REGR_* contract: rows where either side is
    * null are excluded entirely (pre-filtered, so avg(x) and avg(y) see
    * the same pairwise-complete rows), slope = covar_pop/var_pop, null
    * when x is constant. One partial-merged aggregate; no sort, no
    * window. Output: group cols + slope, intercept, n. */
  def trendPerGroup(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast(DoubleType)
    val y = yCol.cast(DoubleType)
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select((groupCols.map(col) :+ x.as("__x")) :+ y.as("__y"): _*)
    base.groupBy(groupCols.map(col): _*)
      .agg(covar_pop(col("__x"), col("__y")).as("__cov"),
        var_pop(col("__x")).as("__var"),
        avg(col("__x")).as("__mx"), avg(col("__y")).as("__my"),
        count(lit(1)).as("n"))
      .withColumn("slope", when(col("__var") > 0, col("__cov") / col("__var")))
      .withColumn("intercept",
        when(col("__var") > 0, col("__my") - col("slope") * col("__mx")))
      .drop("__cov", "__var", "__mx", "__my")
  }

  /** Ordered-step funnel over an event log — "of the users who viewed,
    * how many then clicked, then purchased?". Greedy
    * earliest-completion semantics: a user reaches step i at the
    * EARLIEST event of that type at-or-after their step-(i−1) reach
    * time (the standard product-analytics rule; re-orderings of later
    * events cannot un-reach a step). Long output: one row per reached
    * (user, step) with `step_idx` (1-based), `step`, `reached_us`
    * (epoch micros — integer arithmetic replays across engines).
    *
    * Shape: the event log is filtered to the k step types ONCE, then
    * each step is a user-keyed min-aggregate joined to the previous
    * step's reach times — k−1 user-keyed joins where the reach side
    * shrinks monotonically (AQE broadcasts it as soon as it is small),
    * and the event side was pruned to one type at the scan. No windows,
    * no per-user sort of the whole log. */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 16, "funnel: 1..16 steps")
    require(steps.distinct.size == steps.size, "funnel: duplicate step type")
    val evs = df
      .filter(col(typeCol).isin(steps.map(lit(_)): _*) && col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__et"),
        unix_micros(col(tsCol).cast(TimestampType)).as("__t"))
    var reach = evs.filter(col("__et") === steps.head)
      .groupBy(col("__u")).agg(min(col("__t")).as("__rt"))
    val stages = Seq.newBuilder[DataFrame]
    stages += reach.select(col("__u"), lit(1).as("__idx"),
      lit(steps.head).as("__step"), col("__rt"))
    for (i <- 1 until steps.size) {
      reach = evs.filter(col("__et") === steps(i))
        .join(reach.select(col("__u"), col("__rt").as("__prev")), Seq("__u"))
        .filter(col("__t") >= col("__prev"))
        .groupBy(col("__u")).agg(min(col("__t")).as("__rt"))
      stages += reach.select(col("__u"), lit(i + 1).as("__idx"),
        lit(steps(i)).as("__step"), col("__rt"))
    }
    stages.result().reduce(_ unionByName _)
      .select(col("__u").as(userCol), col("__idx").as("step_idx"),
        col("__step").as("step"), col("__rt").as("reached_us"))
  }

  /** Cohort retention over an event log: users are cohorted by the
    * time bucket of their FIRST event, and each (cohort, bucket-offset)
    * cell counts the distinct users from that cohort active in that
    * bucket. Buckets are epoch-aligned floor divisions of micros
    * (`floorDiv` — negative-safe), so the grid replays exactly in any
    * engine. Output: (cohort_bucket, offset_buckets, n_users), offset 0
    * = the cohort's own bucket.
    *
    * Shape: one user-keyed min-aggregate (first-seen), one user-keyed
    * join back (co-partitioned with the aggregate — AQE reuses the
    * exchange), one distinct-count by (cohort, offset, user). All
    * shuffles are user- or cell-sized; nothing is sorted. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, s"cohortRetention: bucket $bucketMicros")
    val t = unix_micros(col(tsCol).cast(TimestampType))
    // exact floorDiv: (t − pmod) is an exact multiple of the bucket, so
    // the double division is exact (no floor-at-boundary rounding flip)
    val b = lit(bucketMicros)
    val evs = df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
        ((t - pmod(t, b)) / b).cast(LongType).as("__b"))
    val first = evs.groupBy(col("__u")).agg(min(col("__b")).as("__cohort"))
    evs.join(first, Seq("__u"))
      .groupBy(col("__cohort").as("cohort_bucket"),
        (col("__b") - col("__cohort")).as("offset_buckets"))
      .agg(count_distinct(col("__u")).as("n_users"))
  }

  /** Exponentially weighted moving average over the LAST `span` rows per
    * key — the finite-impulse form of pandas `ewm(adjust=True)`: weight
    * (1−α)^j on the j-th lag, normalized over the lags that exist (nulls
    * and series heads renormalize instead of decaying a stale value).
    * Truncating at `span` is what makes the op distributable AND
    * replayable: the weight tail beyond span is (1−α)^span (< 0.4 % of
    * mass at α = 0.5, span = 8), and every output is a fixed arithmetic
    * expression an external oracle can replay lag-for-lag. All `span`
    * lags ride ONE window (one shuffle on keys, one sorted pass);
    * `orderCols` should make the order total (e.g. ts, id) so results
    * are partitioning-independent. α = 0.5 makes every weight a power of
    * two — the products are EXACT in binary floating point, so
    * cross-engine replay cannot drift. Adds column `out`. */
  def ewma(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, span: Int,
      out: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewma: alpha in (0,1], got $alpha")
    require(span >= 1 && span <= 64, s"ewma: span in [1,64], got $span")
    require(partitionCols.nonEmpty, "ewma: partition keys required (global order does not scale)")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val terms = (0 until span).map { j =>
      (lag(col(valueCol), j).over(w), math.pow(1 - alpha, j))
    }
    val num = terms.map { case (x, wj) =>
      when(x.isNotNull, x * wj).otherwise(lit(0.0)) }.reduce(_ + _)
    val den = terms.map { case (x, wj) =>
      when(x.isNotNull, lit(wj)).otherwise(lit(0.0)) }.reduce(_ + _)
    df.withColumn(out, when(den > 0, num / den))
  }

  /** Tumbling time-bucket aggregation (batch face of the streaming
    * tumbling window — same epoch-aligned buckets as
    * `window(col, "1 hour")`). */
  def resample(df: DataFrame, tsCol: String, every: String,
      specs: Seq[(String, Seq[Aggregates.AggFn])]): DataFrame = {
    // First/Last would need a total row order: their min/max-of-struct
    // trick over monotonically_increasing_id is both rejected by Spark
    // (nondeterministic expression in an aggregate) and partition-order,
    // not row-order. aggregateByOrdered carries a real index for this.
    require(!specs.exists(_._2.exists(f =>
        f == Aggregates.First || f == Aggregates.Last)),
      "resample: First/Last need a row order — use Table.aggregateByOrdered " +
        "on a bucket column, which carries the materialized row index")
    val bucket = window(col(tsCol).cast(TimestampType), every)
    val aggs = specs.flatMap { case (c, fns) =>
      fns.map(_.applyTo(c, monotonically_increasing_id()))
    }
    df.groupBy(bucket.getField("start").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Gap-filled (DENSE) tumbling resample: like [[resample]], but the
    * output carries EVERY bucket of the observed time span — hours with
    * no events appear with count 0 and null aggregates, which is what a
    * downstream chart, anomaly detector, or rolling model actually
    * needs (a sparse resample silently hides outages as missing rows).
    *
    * Shape: aggregate first (shrinks to |buckets|), then LEFT JOIN a
    * generated bucket SPINE — `sequence(min, max, interval)` exploded
    * from ONE scalar row, never a per-row blowup. The spine is
    * span-sized (tiny next to the data), the join key is the bucket
    * itself; at 100 TB the cost stays the aggregate's. */
  def resampleDense(df: DataFrame, tsCol: String, every: String,
      specs: Seq[(String, Seq[Aggregates.AggFn])]): DataFrame = {
    val sparse = resample(df, tsCol, every, specs)
    val bounds = sparse.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL $every"))).as("bucket"))
    val countCols = specs.collect { case (c, fns) if fns.contains(Aggregates.Length) =>
      s"${c}_length"
    }
    val filled = spine.join(sparse, Seq("bucket"), "left")
    // absent buckets mean ZERO observations: lengths are 0, not null
    countCols.foldLeft(filled) { (d, cc) =>
      d.withColumn(cc, coalesce(col(cc), lit(0.0)))
    }
  }

  /** Top-k rows per group by an explicit order — "top sources per
    * language", "top domains per shard". `order` must be TOTAL within a
    * group (add a key tie-break) or ranks are nondeterministic. Plans as
    * the two-phase `WindowGroupLimit` shape: each map task keeps its
    * local top-k BEFORE the shuffle, so the exchange carries
    * O(groups·k), not the input ([[Sampling.capPerLabel]] is the same
    * machinery with a fingerprint order — this is the metric-ranked
    * face). Adds `rank` (1-based). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty && order.nonEmpty && k >= 1)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Heavy hitters — approximate frequent items above a support
    * threshold (Karp/misra-gries style single pass, bounded state,
    * partial-merged): the skew PROFILER for 100 TB keys. Guarantee is
    * one-sided: every true >support item IS in the result (possible
    * false positives) — exactly what a salting/skew-join decision needs.
    * Sketch output is impl-defined → spec-verified like the HLL row. */
  def heavyHitters(df: DataFrame, c: String, support: Double = 0.01): DataFrame =
    // NOTE: this is the quick freqItems wrapper (one array row, no counts,
    // impl-defined extras). For exact per-item counts with the same
    // one-sided guarantee — and an oracle-gated result — use
    // [[graft.operators.Sketch.heavyHitters]] (Misra-Gries + re-count).
    df.stat.freqItems(Array(c), support)

  /** Approximate quantiles (Greenwald-Khanna) — bounded-memory alternative
    * to the exact InterpolatedQuantile for approximate-tolerant consumers. */
  def approxQuantiles(df: DataFrame, c: String, probs: Array[Double],
      relErr: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(c, probs, relErr)

  /** Per-key rolling interval: windows never cross the partition key —
    * fully parallel across keys (one shuffle on the key), with none of
    * the whole-table variant's ghost-row duplication. Prefer it whenever
    * a natural key exists. */
  def rollingIntervalWithin(
      df: DataFrame,
      partitionCols: Seq[Column],
      key: String,
      intervalMicros: Long,
      specs: Seq[(String, Seq[Aggregates.AggFn])]): DataFrame = {
    require(intervalMicros > 0,
      s"rollingIntervalWithin: interval must be > 0, got $intervalMicros")
    val ord = rollingOrd(df, key)
    val w = Window.partitionBy(partitionCols: _*).orderBy(ord)
      .rangeBetween(-(intervalMicros - 1), 0)
    val winCols = specs.flatMap { case (c, fns) =>
      fns.map(fn => windowed(fn, col(c), w).as(s"${c}_${fn.fnName}"))
    }
    df.select((partitionCols :+ col(key)) ++ winCols: _*)
  }

  /** AggFn -> windowed aggregate; `.over` is applied to each aggregate CALL
    * (not to compound arithmetic). first/last by row order are not part of
    * the reference's rolling surface. */
  private def windowed(fn: Aggregates.AggFn, c: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = fn match {
    case Aggregates.Minimum  => min(c).over(w).cast(DoubleType)
    case Aggregates.Maximum  => max(c).over(w).cast(DoubleType)
    case Aggregates.Mean     => avg(c).over(w).cast(DoubleType) // decimal -> double
    case Aggregates.Length   => count(lit(1)).over(w).cast(DoubleType)
    case Aggregates.Sum      => coalesce(sum(c).over(w), lit(0)).cast(DoubleType)
    case Aggregates.Median   => InterpolatedQuantile.medianCol(c).over(w)
    case Aggregates.Variance => when(count(c).over(w) >= 2, var_pop(c).over(w))
    case Aggregates.StdDev   => when(count(c).over(w) >= 2, stddev_pop(c).over(w))
    case Aggregates.Rsi =>
      val cd = c.cast(DoubleType)
      val up = avg(when(cd.isNotNull, greatest(cd, lit(0.0)))).over(w)
      val down = avg(when(cd.isNotNull, least(cd, lit(0.0)))).over(w)
      when(up - down =!= 0.0, lit(100.0) * up / (up - down))
    case other => throw new IllegalArgumentException(s"rollingInterval: unsupported ${other.fnName}")
  }

  // ---- Poisson bootstrap (the large-scale bootstrap: per-row ----
  // ---- Poisson(1) replicate weights instead of resampling —   ----
  // ---- Chamandy et al. 2012, "Estimating Uncertainty for      ----
  // ---- Massive Data Streams")                                 ----

  /** Poisson(1) inverse CDF over the cumulative literals — the SAME
    * constants an SQL oracle inlines, so the weights replay exactly.
    * Capped at 8 (P ≈ 1e-6 tail). */
  private val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  private def poissonInv(u: Column): Column =
    PoissonCdf1.zipWithIndex.foldRight(lit(PoissonCdf1.length): Column) {
      case ((c, k), acc) => when(u < c, k).otherwise(acc)
    }

  /** Per-replicate weighted sums for a Poisson bootstrap of `measure`:
    * row r gets weight `Poisson(1)` in replicate b, derived
    * DETERMINISTICALLY from the pinned hash of `id:b` (same recipe as
    * the DLT sample: one int→double rounding + one exact 2^-63 scale),
    * so an SQL oracle replays every weight, and the replicate set is
    * stable across runs and partitionings. Output: one row per
    * replicate with the effective count (Σw) and the weighted
    * DECIMAL(38,4) sum (order-invariant addition — the double sum
    * would hash-drift under partial-agg order).
    *
    * Scale shape: the B-way explode is narrow and feeds a partial
    * aggregate keyed on the replicate — ≤ B rows leave each map task
    * no matter the corpus size; nothing corpus-sized shuffles. The
    * point of the Poisson form IS this one-pass shape: a true
    * resample would need B materialized copies. */
  def poissonBootstrap(df: DataFrame, idCol: String, measure: Column,
      b: Int, tag: String = "boot"): DataFrame = {
    require(b >= 1, s"poissonBootstrap: need b >= 1, got $b")
    val base = df.select(col(idCol).cast(StringType).as("__id"),
        measure.cast(DoubleType).as("__m"))
      .withColumn("replicate", explode(sequence(lit(0L), lit(b - 1L))))
    val u = (Sketch.pinnedHash(
        concat(col("__id"), lit(":"), col("replicate").cast(StringType)), tag)
      + lit(1L)).cast(DoubleType) /
      lit(9223372036854775808.0) // 2^63: exact double, exact scale
    base.withColumn("__w", poissonInv(u))
      // one IEEE multiply then the deterministic double->decimal cast:
      // both replay bit-identically in any engine
      .withColumn("__wm", (col("__m") * col("__w")).cast(DecimalType(38, 4)))
      .groupBy(col("replicate"))
      .agg(sum(col("__w")).cast(LongType).as("n_eff"),
        sum(col("__wm")).as("sum_w"))
  }

  /** Percentile CI from the replicate table: the [⌊α/2·(B−1)⌋,
    * ⌊(1−α/2)·(B−1)⌋] ORDER STATISTICS of the replicate means —
    * deterministic, no interpolation ambiguity. The replicate table is
    * B rows; this is a driver-free finish over a tiny frame. */
  def bootstrapCI(replicates: DataFrame, alpha: Double = 0.05): DataFrame = {
    val mean = (col("sum_w") / col("n_eff")).cast(DoubleType)
    replicates.filter(col("n_eff") > 0)
      .agg(sort_array(collect_list(mean)).as("__ms"))
      .select(
        element_at(col("__ms"),
          (floor(lit(alpha / 2) * (size(col("__ms")) - 1)) + 1).cast(IntegerType))
          .as("ci_lo"),
        element_at(col("__ms"),
          (floor(lit(1.0 - alpha / 2) * (size(col("__ms")) - 1)) + 1).cast(IntegerType))
          .as("ci_hi"))
  }
}
