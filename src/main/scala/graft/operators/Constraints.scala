package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality constraints — the expectation-suite gate a
  * production ingest runs before a dataset version is accepted
  * (Deequ-style checks, re-expressed Spark-first): completeness,
  * range/format conformance, key uniqueness, referential integrity.
  *
  * Everything is counted in exact integers and thresholds are
  * PARTS-PER-MILLION longs, so a verdict is identical at any scale and
  * parallelism — a fraction-typed metric would wobble in its last
  * double digit across summation orders and make the gate itself flaky
  * (the same cross-engine trap the exact-decimal aggregation mode
  * closes for totals).
  *
  * Scale shape: every ROW-LOCAL check (completeness, range, regex)
  * folds into ONE aggregate pass over the table — adding checks adds
  * conditional-sum columns, not scans. Uniqueness rides the same pass
  * as count_distinct (one Expand). Referential integrity is one LEFT
  * ANTI join per reference (dedup'd reference side, broadcast-able
  * when the key universe is dim-sized). Verdict rows are one per
  * check — driver-side assembly of scalars, never data.
  */
object Constraints {

  sealed trait Check
  /** Completeness: at most `maxNullPpm` of rows may be null. */
  final case class NotNull(col: String, maxNullPpm: Long = 0L) extends Check
  /** Conformance: rows outside [lo, hi] (nulls count as violations) ≤ ppm. */
  final case class InRange(col: String, lo: Double, hi: Double,
      maxViolPpm: Long = 0L) extends Check
  /** Format: rows not fully matching `regex` (nulls violate) ≤ ppm. */
  final case class MatchesRegex(col: String, regex: String,
      maxViolPpm: Long = 0L) extends Check
  /** Key uniqueness: duplicate rows (beyond the first per key) ≤ ppm.
    * Null keys group like values (a repeated null key is a duplicate). */
  final case class Unique(cols: Seq[String], maxDupPpm: Long = 0L) extends Check
  /** Referential integrity: rows whose `col` has no match in
    * `refTable.refCol` ≤ ppm (null FKs are orphans — declare them away
    * with a prior NotNull if nulls are legal). */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String,
      maxOrphanPpm: Long = 0L) extends Check

  val schema: StructType = StructType(Seq(
    StructField("chk", StringType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("violations", LongType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("threshold_ppm", LongType, nullable = false),
    StructField("passed", BooleanType, nullable = false)))

  /** Run the suite; one verdict row per check:
    * (chk, col_name, violations, total, threshold_ppm,
    *  passed = violations · 10⁶ ≤ threshold_ppm · total). */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Constraints.validate: empty suite")
    val spark = df.sparkSession
    // one fused aggregate pass: count(*) + a conditional sum per
    // row-local check + a countDistinct per Unique
    // coalesce(sum, 0): a conditional sum over an EMPTY table is null,
    // and a null violation count would NPE the verdict unboxing — an
    // empty dataset has zero violations, not unknown ones
    val rowLocal: Seq[(Check, org.apache.spark.sql.Column)] = checks.collect {
      case c @ NotNull(col0, _) =>
        c -> coalesce(sum(when(col(col0).isNull, 1L).otherwise(0L)), lit(0L))
      case c @ InRange(col0, lo, hi, _) =>
        c -> coalesce(sum(when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L)
          .otherwise(0L)), lit(0L))
      case c @ MatchesRegex(col0, re, _) =>
        c -> coalesce(sum(when(col(col0).isNull || !col(col0).rlike("^(?:" + re + ")$"), 1L)
          .otherwise(0L)), lit(0L))
      case c @ Unique(cols0, _) =>
        // duplicates beyond the first per key; null keys group like values
        c -> (count(lit(1)) - count_distinct(struct(cols0.map(col): _*)))
    }
    val aggCols = count(lit(1)).as("__total") +:
      rowLocal.zipWithIndex.map { case ((_, e), i) => e.as(s"__m$i") }
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val total = aggRow.getLong(0)

    def verdict(chk: String, colName: String, viol: Long, ppm: Long): Row =
      Row(chk, colName, viol, total, ppm,
        // exact integer gate — no fraction, no double, no scale drift
        viol * 1000000L <= ppm * total)

    val rows = checks.map { c =>
      c match {
        case NotNull(col0, ppm) =>
          val i = rowLocal.indexWhere(_._1 eq c)
          verdict("not_null", col0, aggRow.getLong(i + 1), ppm)
        case InRange(col0, _, _, ppm) =>
          val i = rowLocal.indexWhere(_._1 eq c)
          verdict("in_range", col0, aggRow.getLong(i + 1), ppm)
        case MatchesRegex(col0, _, ppm) =>
          val i = rowLocal.indexWhere(_._1 eq c)
          verdict("matches_regex", col0, aggRow.getLong(i + 1), ppm)
        case Unique(cols0, ppm) =>
          val i = rowLocal.indexWhere(_._1 eq c)
          verdict("unique", cols0.mkString(","), aggRow.getLong(i + 1), ppm)
        case RefIntegrity(col0, ref, refCol, ppm) =>
          val orphans = df.select(col(col0))
            .join(ref.select(col(refCol).as(col0)).distinct(), Seq(col0), "left_anti")
            .count()
          verdict("ref_integrity", col0, orphans, ppm)
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** True iff every check in the suite passed — the ingest gate bit. */
  def holds(df: DataFrame, checks: Seq[Check]): Boolean =
    validate(df, checks).filter(!col("passed")).isEmpty

  // ---- suites as data: config-table (de)serialization ----------------

  /** Config-table schema for suites-as-data: one row per check, typed
    * parameter columns (unused ones null), so a suite can live NEXT TO
    * the dataset it gates — same parquet directory, same snapshot/SCD2
    * versioning, same diff tooling — instead of being compiled into job
    * code that drifts independently of the data contract. */
  val suiteSchema: StructType = StructType(Seq(
    StructField("chk", StringType, nullable = false),
    StructField("col_name", StringType, nullable = false), // comma-joined for unique
    StructField("lo", DoubleType, nullable = true),
    StructField("hi", DoubleType, nullable = true),
    StructField("regex", StringType, nullable = true),
    StructField("ref_table", StringType, nullable = true),
    StructField("ref_col", StringType, nullable = true),
    StructField("threshold_ppm", LongType, nullable = false)))

  /** Parse a config table into a runnable suite. The config is collected
    * driver-side BY DESIGN (a suite is tens of rows — it is metadata,
    * not data) and ordered by (chk, col_name, threshold_ppm) so a
    * distributed config source yields a deterministic suite.
    * `resolve` maps a `ref_table` name to its DataFrame for
    * referential-integrity checks. Unknown check kinds and missing
    * parameters fail loudly — a silently-skipped check is a gate that
    * lies. */
  def suiteFrom(config: DataFrame,
      resolve: String => DataFrame = name => throw new IllegalArgumentException(
        s"Constraints.suiteFrom: no resolver provided for ref table '$name'")): Seq[Check] = {
    val rows = config
      .select(suiteSchema.fieldNames.map(col).toSeq: _*)
      .collect()
      .sortBy(r => (r.getString(0), r.getString(1), r.getLong(7)))
    require(rows.nonEmpty, "Constraints.suiteFrom: empty config table")
    rows.toSeq.map { r =>
      val chk = r.getString(0); val cn = r.getString(1); val ppm = r.getLong(7)
      def need[T](i: Int, what: String): T = {
        require(!r.isNullAt(i), s"Constraints.suiteFrom: $chk($cn) needs $what")
        r.get(i).asInstanceOf[T]
      }
      chk match {
        case "not_null"      => NotNull(cn, ppm)
        case "in_range"      => InRange(cn, need[Double](2, "lo"), need[Double](3, "hi"), ppm)
        case "matches_regex" => MatchesRegex(cn, need[String](4, "regex"), ppm)
        case "unique"        => Unique(cn.split(",").toSeq, ppm)
        case "ref_integrity" =>
          RefIntegrity(cn, resolve(need[String](5, "ref_table")), need[String](6, "ref_col"), ppm)
        case other => throw new IllegalArgumentException(
          s"Constraints.suiteFrom: unknown check kind '$other' for column '$cn'")
      }
    }
  }

  /** Serialize a suite back to config rows ([[suiteSchema]]) — the
    * round-trip face of [[suiteFrom]]. `refName` supplies the stored
    * name of each RefIntegrity's reference table (a DataFrame has no
    * canonical name). */
  def suiteDf(spark: SparkSession, checks: Seq[Check],
      refName: RefIntegrity => String = c => throw new IllegalArgumentException(
        s"Constraints.suiteDf: provide refName to serialize $c")): DataFrame = {
    require(checks.nonEmpty, "Constraints.suiteDf: empty suite")
    val rows = checks.map {
      case NotNull(cn, ppm)          => Row("not_null", cn, null, null, null, null, null, ppm)
      case InRange(cn, lo, hi, ppm)  => Row("in_range", cn, lo, hi, null, null, null, ppm)
      case MatchesRegex(cn, re, ppm) => Row("matches_regex", cn, null, null, re, null, null, ppm)
      case Unique(cols0, ppm)        => Row("unique", cols0.mkString(","), null, null, null, null, null, ppm)
      case c @ RefIntegrity(cn, _, refCol, ppm) =>
        Row("ref_integrity", cn, null, null, null, refName(c), refCol, ppm)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, suiteSchema)
  }

  // ---- streaming face: observed metrics on the ingest stream ----

  /** Attach the suite's ROW-LOCAL checks to a (possibly streaming)
    * DataFrame via `Dataset.observe` — quality metrics ride the existing
    * plan with ZERO extra passes or state, surfacing per micro-batch in
    * `StreamingQueryProgress.observedMetrics(name)` (batch: via
    * QueryExecutionListener). This is the production shape for quality
    * monitoring DURING ingest: the gate aggregates what already flows.
    *
    * Only row-local checks are observable (observe forbids distinct
    * aggregates and can't join): Unique / RefIntegrity throw — run
    * those through [[validate]] on the landed data instead. */
  def observed(df: DataFrame, name: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Constraints.observed: empty suite")
    // coalesce(sum, 0): an EMPTY micro-batch reports null sums, and a
    // null metric would NPE verdictsFrom's unboxing
    val metricCols = checks.zipWithIndex.map {
      case (NotNull(col0, _), i) =>
        coalesce(sum(when(col(col0).isNull, 1L).otherwise(0L)), lit(0L)).as(s"v$i")
      case (InRange(col0, lo, hi, _), i) =>
        coalesce(sum(when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L)
          .otherwise(0L)), lit(0L)).as(s"v$i")
      case (MatchesRegex(col0, re, _), i) =>
        coalesce(sum(when(col(col0).isNull || !col(col0).rlike("^(?:" + re + ")$"), 1L)
          .otherwise(0L)), lit(0L)).as(s"v$i")
      case (c, _) => throw new IllegalArgumentException(
        s"Constraints.observed: only row-local checks are observable, got $c " +
          "(run Unique/RefIntegrity via validate() on the landed data)")
    }
    df.observe(name, count(lit(1)).as("total"), metricCols: _*)
  }

  /** Decode one observed-metrics row (from
    * `StreamingQueryProgress.observedMetrics` or a listener) back into
    * verdict rows — same exact integer PPM gate as [[validate]]. */
  def verdictsFrom(metrics: Row, checks: Seq[Check]): Seq[Row] = {
    val total = metrics.getAs[Long]("total")
    checks.zipWithIndex.map { case (c, i) =>
      val viol = metrics.getAs[Long](s"v$i")
      val (chk, colName, ppm) = c match {
        case NotNull(col0, p) => ("not_null", col0, p)
        case InRange(col0, _, _, p) => ("in_range", col0, p)
        case MatchesRegex(col0, _, p) => ("matches_regex", col0, p)
        case other => throw new IllegalArgumentException(
          s"Constraints.verdictsFrom: non-observable check $other")
      }
      Row(chk, colName, viol, total, ppm, viol * 1000000L <= ppm * total)
    }
  }
}
