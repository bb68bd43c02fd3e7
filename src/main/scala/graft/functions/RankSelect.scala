package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics for UNGROUPED (whole-column)
  * quantiles — the scale path for `describe` / `equiDepthBins` /
  * `winsorize` / `madOutliers` / `driftPsi`.
  *
  * The buffered [[InterpolatedQuantile]] aggregate is the right tool for
  * GROUPED and WINDOWED quantiles (O(group) buffer is the honest cost of
  * exactness there), but run ungrouped its final merge concentrates the
  * whole column into ONE task's buffer — at 10^12 values that is an OOM,
  * not a slowdown. This object answers the same order statistics by
  * iterative rank search instead: histogram passes narrow each wanted
  * rank's value interval geometrically until the interval collapses to
  * the order statistic itself. No task ever holds more than a
  * (targets × buckets) count map; the driver holds one (count, min, max)
  * row per (target, bucket) per pass.
  *
  * One pass handles EVERY requested rank of EVERY requested column at
  * once (describe's q1/median/q3 over n columns = one pass sequence, not
  * 3n), and each pass is: scan → per-row explode of the ≤targets
  * interval hits → partial-merged (count, min, max) by (target, bucket)
  * → ≤ targets·B rows to the driver. Convergence: the next interval is
  * the chosen bucket's actual data [min, max], so every pass either
  * resolves a target (min == max — also what terminates duplicate-heavy
  * columns) or shrinks its interval ≥ (B−2)×; the full double range
  * collapses in < 200 passes worst-case and ≤ 8 on real data.
  *
  * Ordering semantics are Spark SQL's (NaN greatest, NaN == NaN,
  * -0.0 == 0.0), which agree with the buffered aggregate's
  * `Arrays.sort` on everything except the sign of a zero picked at a
  * boundary — numerically identical.
  *
  * Exactness contract is spec'd as bit-equality against the buffered
  * aggregate on adversarial layouts (duplicates, NaN/±Inf tails,
  * sub-ULP neighbors, full-range spans).
  */
object RankSelect {

  /** Buckets per refinement pass. 4096 keeps a pass's driver result
    * ≤ targets·4096 tiny rows while shrinking intervals ~4000× each
    * round. */
  private val B = 4096

  private final class Target(
      val colName: String,
      /** 1-based rank among the column's non-null values. */
      val rankWanted: Long) {
    var lo: Double = 0.0
    var hi: Double = 0.0
    /** rank within [lo, hi] (1-based). */
    var rank: Long = rankWanted
    var result: Option[Double] = None
  }

  /** Exact order statistics: for each (column, ranks) spec, the value
    * whose 1-based rank among the column's non-null values (Spark
    * ordering, NaN last) is `rank`. Requires every rank ∈ [1, N_col];
    * throws if a column has no non-null values. */
  def orderStatistics(df: DataFrame,
      specs: Seq[(String, Seq[Long])]): Map[(String, Long), Double] =
    selectRanks(df, specs, None)

  /** WEIGHTED exact order statistics: rank r (1-based, in INTEGRAL
    * weight mass) selects the smallest value whose cumulative weight
    * along the value order reaches r — the inverted-CDF form, so
    * `r = ceil(q·W)` answers "the doc length at which fraction q of
    * the token MASS sits", the packing/curriculum statistic exact
    * quantiles can't express unweighted. Rows with a null value or a
    * null/non-positive weight carry no mass. Same pass machinery and
    * bounds as the unweighted path (histograms sum weights instead of
    * counting rows). */
  def weightedOrderStatistics(df: DataFrame, specs: Seq[(String, Seq[Long])],
      weightCol: String): Map[(String, Long), Double] =
    selectRanks(df, specs, Some(weightCol))

  /** Every refinement pass is a full scan; without a cache each pass
    * re-reads (and re-decodes) the source parquet. Persist ONLY the
    * referenced columns — a few narrow numeric columns, spillable and
    * distributed across executors, so the bounded-per-task-state
    * property is untouched — and let the prepass + every rank pass scan
    * the cache instead. */
  private def withCachedProjection[T](df: DataFrame, cols: Seq[String])(
      f: DataFrame => T): T = {
    val proj = df.select(cols.distinct.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(proj) finally proj.unpersist(blocking = false)
  }

  private def selectRanks(dfIn: DataFrame, specs: Seq[(String, Seq[Long])],
      weightCol: Option[String]): Map[(String, Long), Double] = {
    require(specs.nonEmpty && specs.forall(_._2.nonEmpty), "orderStatistics: empty spec")
    val colNames = specs.map(_._1).distinct
    withCachedProjection(dfIn, colNames ++ weightCol) { cached =>
      selectRanksBy(cached, colNames, weightCol) { (c, n) =>
        val ranks = specs.filter(_._1 == c).flatMap(_._2).distinct
        require(n > 0, s"orderStatistics: '$c' has no non-null values")
        ranks.foreach(r => require(r >= 1 && r <= n,
          s"orderStatistics: rank $r outside [1, $n] for '$c'"))
        ranks
      }._2
    }
  }

  /** Pass-0 aggregate (total mass / min / max per column) FUSED with the
    * rank-target construction: `ranksOf(col, totalMass)` is consulted
    * after pass 0 so callers that derive their ranks from N (every
    * quantile entry point) don't pay a separate counting scan. Returns
    * (per-column (mass, min, max), resolved order statistics). */
  private def selectRanksBy(df: DataFrame, colNames: Seq[String],
      weightCol: Option[String])(ranksOf: (String, Long) => Seq[Long])
      : (Map[String, (Long, Double, Double)], Map[(String, Long), Double]) = {
    // per-row mass: 1 unweighted, else the (positive) weight
    def massOf(x: org.apache.spark.sql.Column) = weightCol match {
      case None => when(x.isNotNull, lit(1L))
      case Some(wc) =>
        when(x.isNotNull && col(wc).isNotNull && col(wc).cast("long") > 0,
          col(wc).cast("long"))
    }
    // pass 0: per-column mass / min / max (min & max resolve rank 1 / W
    // immediately and seed every interval)
    val aggs = colNames.flatMap { c =>
      val x = col(c).cast("double")
      val m = massOf(x)
      val xe = when(m.isNotNull, x) // eligible values only
      Seq(coalesce(sum(m), lit(0L)).as(s"${c}__n"),
        min(xe).as(s"${c}__mn"), max(xe).as(s"${c}__mx"))
    }
    val row0 = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = colNames.zipWithIndex.map { case (c, i) =>
      c -> ((row0.getLong(i * 3),
        if (row0.isNullAt(i * 3 + 1)) Double.NaN else row0.getDouble(i * 3 + 1),
        if (row0.isNullAt(i * 3 + 2)) Double.NaN else row0.getDouble(i * 3 + 2)))
    }.toMap
    val targets = colNames.flatMap { c =>
      val (n, mn, mx) = stats(c)
      ranksOf(c, n).distinct.map { r =>
        val t = new Target(c, r)
        if (r == 1L) t.result = Some(mn)
        else if (r == n) t.result = Some(mx)
        else { t.lo = mn; t.hi = mx }
        t
      }
    }

    var pass = 0
    while (targets.exists(_.result.isEmpty)) {
      pass += 1
      require(pass <= 300, "orderStatistics: failed to converge (300 passes)")
      // PROBE DEDUP: targets sharing (column, interval) — every rank of a
      // column on pass 1, and a lerp's adjacent order statistics
      // thereafter — share one histogram instead of contributing per target
      val active = targets.filter(_.result.isEmpty)
        .groupBy(t => (t.colName, t.lo, t.hi)).values.map(_.toSeq).toSeq
      case class Contrib(t: Int, inInterval: Column, bucket: Column,
        x: Column, m: Column)
      val contribs = active.zipWithIndex.map { case (ts, i) =>
        val t = ts.head
        val x = col(t.colName).cast("double")
        val m = massOf(x)
        // finite clamps so the bucket width is finite even for ±Inf/NaN
        // interval ends; NaN/+Inf route to the top bucket, −Inf to the
        // bottom — each then resolves via its bucket's min == max
        val loF = if (t.lo == Double.NegativeInfinity) -Double.MaxValue else t.lo
        val hiF =
          if (t.hi.isNaN || t.hi == Double.PositiveInfinity) Double.MaxValue
          else t.hi
        // divide ends separately: (hiF - loF) overflows to Inf when the
        // interval spans most of the double range. −Inf, +Inf and NaN
        // each get a PRIVATE bucket (0, B−2, B−1) in order position —
        // sharing one would leave an [∞, NaN] interval unable to split
        val w = math.max(hiF / (B - 3) - loF / (B - 3), java.lang.Double.MIN_VALUE)
        val bucket =
          when(isnan(x), lit(B - 1))
            .when(x === Double.PositiveInfinity, lit(B - 2))
            .when(x === Double.NegativeInfinity, lit(0))
            .otherwise(lit(1) + least(lit((B - 4).toDouble),
              greatest(lit(0.0), floor((x - loF) / w))).cast("int"))
        // interval test in the NaN-greatest total order, written
        // NaN-explicitly so it is correct under either Java or Spark
        // comparison semantics for NaN
        val geLo = if (t.lo.isNaN) isnan(x) else (x >= t.lo) || isnan(x)
        val leHi =
          if (t.hi.isNaN) lit(true) // NaN is the greatest: everything ≤ it
          else if (t.hi == Double.PositiveInfinity) !isnan(x)
          else (x <= t.hi) && !isnan(x)
        Contrib(i, m.isNotNull && geLo && leHi, bucket, x, m)
      }
      // Few interval groups (the normal case — a handful of columns ×
      // shared pass-1 intervals): a UNION of per-group filtered
      // projections over the cached projection stays entirely inside
      // whole-stage codegen and measured 4× faster per pass than the
      // explode(array_compact(array(struct…))) formulation (the Generate
      // + struct materialization cost ~1.3 s/pass vs 0.4 s at sf0.1 —
      // r12). Many groups: fall back to the single-scan explode form
      // rather than re-scan the cache dozens of times.
      val hist =
        if (contribs.size <= 16) {
          contribs.map { c =>
            df.filter(c.inInterval)
              .select(lit(c.t).as("t"), c.bucket.as("b"),
                c.x.as("v"), c.m.as("m"))
          }.reduce(_ unionAll _)
        } else {
          df.select(explode(array_compact(array(contribs.map(c =>
            when(c.inInterval, struct(lit(c.t).as("t"), c.bucket.as("b"),
              c.x.as("v"), c.m.as("m")))): _*))).as("c"))
            .select(col("c.t").as("t"), col("c.b").as("b"),
              col("c.v").as("v"), col("c.m").as("m"))
        }
      val perBucket = hist
        .groupBy(col("t"), col("b"))
        .agg(sum(col("m")).as("mass"), count(lit(1)).as("rows"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .groupBy(_.getInt(0))
      active.zipWithIndex.foreach { case (ts, i) =>
        val buckets = perBucket(i)
          .map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getDouble(5)))
          .sortBy(_._1)
        ts.foreach { t =>
          var remaining = t.rank
          var done = false
          for ((_, mass, rows, mn, mx) <- buckets if !done) {
            if (remaining <= mass) {
              if (rows == 1L || java.lang.Double.compare(mn, mx) == 0)
                t.result = Some(mn)
              else { t.lo = mn; t.hi = mx; t.rank = remaining }
              done = true
            } else remaining -= mass
          }
          require(done, s"orderStatistics: rank ${t.rank} not found in " +
            s"[${t.lo}, ${t.hi}] of '${t.colName}' (concurrent mutation?)")
        }
      }
    }
    (stats, targets.map(t => (t.colName, t.rankWanted) -> t.result.get).toMap)
  }

  /** Exact interpolated quantiles (the reference's `n = N·q − 0.5` lerp,
    * [[InterpolatedQuantile.quantileSorted]] bit-for-bit) for every
    * (column, qs) spec — `Some(values)` per column, or None for a column
    * with no non-null values (the buffered aggregate's null). */
  def quantiles(df: DataFrame,
      specs: Seq[(String, Seq[Double])]): Map[String, Option[Seq[Double]]] = {
    val colNames = specs.map(_._1).distinct
    val qsByCol = specs.groupBy(_._1).map { case (c, ss) => c -> ss.flatMap(_._2) }
    withCachedProjection(df, colNames) { cached =>
      // ranks each lerp needs (floor and ceil order statistics), derived
      // from pass 0's count — no separate counting scan
      val (stats0, stats) = selectRanksBy(cached, colNames, None) { (c, n) =>
        if (n == 0) Nil else qsByCol(c).flatMap(q => ranksFor(n, q)).distinct
      }
      specs.map { case (c, qs) =>
        val n = stats0(c)._1
        if (n == 0) c -> None
        else c -> Some(qs.map(q => lerp(n, q, r => stats((c, r)))))
      }.toMap
    }
  }

  /** Convenience: one column, whole-frame exact quantiles. */
  def quantilesOf(df: DataFrame, c: String, qs: Seq[Double]): Option[Seq[Double]] =
    quantiles(df, Seq(c -> qs))(c)

  /** Weighted inverted-CDF quantiles for several value columns sharing
    * one weight column: per column, the smallest value whose cumulative
    * weight (along the value order) reaches `ceil(q·W)` — exact, and
    * directly replayable by a `sum(w) OVER (ORDER BY x)` window oracle.
    * None for a column with no positive-weight values. */
  def weightedQuantiles(df: DataFrame, specs: Seq[(String, Seq[Double])],
      weightCol: String): Map[String, Option[Seq[Double]]] = {
    require(specs.forall(_._2.forall(q => q > 0 && q <= 1)),
      s"weightedQuantiles: qs in (0, 1]")
    val colNames = specs.map(_._1).distinct
    val qsByCol = specs.groupBy(_._1).map { case (c, ss) => c -> ss.flatMap(_._2) }
    withCachedProjection(df, colNames :+ weightCol) { cached =>
      // ceil(q·W) in double — the same IEEE arithmetic an SQL oracle
      // runs — with W taken from pass 0 (no separate mass scan)
      val (stats0, stats) = selectRanksBy(cached, colNames, Some(weightCol)) {
        (c, w) =>
          if (w == 0) Nil
          else qsByCol(c).map(q => math.ceil(q * w.toDouble).toLong).distinct
      }
      specs.map { case (c, qs) =>
        val w = stats0(c)._1
        if (w == 0) c -> None
        else c -> Some(qs.map(q => stats((c, math.ceil(q * w.toDouble).toLong))))
      }.toMap
    }
  }

  /** The 1-based ranks the `N·q − 0.5` lerp touches at quantile q. */
  private def ranksFor(n: Long, q: Double): Seq[Long] = {
    if (q >= 1.0) return Seq(n)
    if (q <= 0.0) return Seq(1L)
    val x = n * q - 0.5
    val n1 = math.max(0L, math.floor(x).toLong)
    val n2 = math.min(n - 1, math.ceil(x).toLong)
    Seq(n1 + 1, n2 + 1).distinct
  }

  /** [[InterpolatedQuantile.quantileSorted]] re-expressed over an
    * order-statistic oracle (1-based ranks) — identical arithmetic. */
  private def lerp(n: Long, q: Double, stat: Long => Double): Double = {
    if (q >= 1.0) return stat(n)
    if (q <= 0.0) return stat(1L)
    val x = n * q - 0.5
    val n1 = math.max(0L, math.floor(x).toLong)
    val n2 = math.min(n - 1, math.ceil(x).toLong)
    val t = x - math.floor(x)
    (1 - t) * stat(n1 + 1) + t * stat(n2 + 1)
  }
}
