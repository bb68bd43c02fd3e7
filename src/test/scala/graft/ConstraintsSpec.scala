package graft

import graft.operators.Constraints
import graft.operators.Constraints._
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite: exact integer verdicts. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Option(10.0), Option("a@x.io"), Option("US")),
    (2L, Option(20.0), Option("bad"), Option("DE")),
    (3L, None: Option[Double], Option("c@y.org"), Option("US")),
    (3L, Option(-5.0), None: Option[String], Option("FR")),
    (5L, Option(30.0), Option("e@z.net"), None: Option[String]))
    .toDF("id", "amount", "email", "country")

  private def verdicts(checks: Seq[Check]): Map[(String, String), (Long, Long, Boolean)] =
    Constraints.validate(df, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap

  test("all check types count violations exactly") {
    val v = verdicts(Seq(
      NotNull("amount"),                        // 1 null -> fail at 0 ppm
      NotNull("id"),                            // 0 nulls -> pass
      InRange("amount", 0.0, 100.0),            // null + (-5) = 2 violations
      MatchesRegex("email", "[a-z]+@[a-z.]+"),  // "bad" + null = 2 violations
      Unique(Seq("id")),                        // id 3 twice -> 1 duplicate
      RefIntegrity("country",
        Seq("US", "DE").toDF("c"), "c")))       // FR + null = 2 orphans
    assert(v(("not_null", "amount")) == ((1L, 0L, false)))
    assert(v(("not_null", "id")) == ((0L, 0L, true)))
    assert(v(("in_range", "amount")) == ((2L, 0L, false)))
    assert(v(("matches_regex", "email")) == ((2L, 0L, false)))
    assert(v(("unique", "id")) == ((1L, 0L, false)))
    assert(v(("ref_integrity", "country")) == ((2L, 0L, false)))
    assert(Constraints.validate(df, Seq(NotNull("id"))).head().getLong(3) == 5L) // total
  }

  test("ppm thresholds gate by exact integer math, boundary inclusive") {
    // 1 violation of 5 rows = 200,000 ppm exactly: threshold 200000 passes,
    // 199999 fails — no double rounding anywhere near the boundary
    val v1 = verdicts(Seq(NotNull("amount", maxNullPpm = 200000L)))
    assert(v1(("not_null", "amount"))._3)
    val v2 = verdicts(Seq(NotNull("amount", maxNullPpm = 199999L)))
    assert(!v2(("not_null", "amount"))._3)
  }

  test("unique treats repeated null keys as duplicates; holds() gates the suite") {
    val d2 = Seq(Option(1L), None, None).toDF("k")
    val v = Constraints.validate(d2, Seq(Unique(Seq("k")))).head()
    assert(v.getLong(2) == 1L && !v.getBoolean(5))
    assert(Constraints.holds(df, Seq(NotNull("id"), Unique(Seq("id", "amount")))))
    assert(!Constraints.holds(df, Seq(NotNull("amount"))))
  }

  test("empty dataset: zero violations everywhere, every check passes") {
    // a conditional sum over an empty table is null — the verdicts must
    // read it as ZERO violations, not NPE on the unboxing
    val empty = df.filter(lit(false))
    val v = Constraints.validate(empty, Seq(
      NotNull("amount"), InRange("amount", 0.0, 1.0),
      MatchesRegex("email", ".*"), Unique(Seq("id")),
      RefIntegrity("country", Seq("US").toDF("c"), "c"))).collect()
    assert(v.length == 5)
    assert(v.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getBoolean(5)))
  }

  test("observed constraints ride an ingest stream; metrics decode to exact verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Option[Double])]
    val checks: Seq[Check] = Seq(
      NotNull("amount", maxNullPpm = 350000L), // 1 of 3 null = 333,333 ppm -> passes
      InRange("amount", 0.0, 100.0))           // null + (-5) = 2 violations -> fails
    val out = Constraints.observed(input.toDF.toDF("id", "amount"), "dq", checks)
    val q = out.writeStream.format("noop").outputMode("append").start()
    try {
      input.addData((1L, Some(10.0)), (2L, None), (3L, Some(-5.0)))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("dq"))).last
      val v = Constraints.verdictsFrom(m, checks)
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
      assert(v == Seq(
        ("not_null", 1L, 3L, true),
        ("in_range", 2L, 3L, false)))
    } finally q.stop()
    // non-row-local checks are rejected up front, not silently dropped
    intercept[IllegalArgumentException] {
      Constraints.observed(df, "dq2", Seq(Unique(Seq("id"))))
    }
  }

  test("row-local checks fold into ONE aggregate pass (no per-check scans)") {
    val suite: Seq[Check] = Seq(NotNull("amount"), InRange("amount", 0, 100),
      MatchesRegex("email", ".*"), Unique(Seq("id")))
    // count scans in the executed plan of the fused aggregate: validate
    // runs eagerly, so audit the equivalent agg the implementation builds
    val plan = df.agg(count(lit(1)), sum(when(col("amount").isNull, 1L).otherwise(0L)),
      count_distinct(struct(col("id"))))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 2) // expand for distinct, no N scans
    // and the verdict row count equals the suite size
    assert(Constraints.validate(df, suite).count() == suite.size)
  }

  test("suites-as-data: suiteDf -> suiteFrom round-trips every check kind") {
    val ref = Seq(("US"), ("DE")).toDF("code")
    val suite: Seq[Check] = Seq(
      NotNull("amount", 100L),
      InRange("amount", 0.0, 100.0, 5L),
      MatchesRegex("email", ".*@.*", 0L),
      Unique(Seq("id", "country")),
      RefIntegrity("country", ref, "code", 7L))
    val config = Constraints.suiteDf(spark, suite, _ => "codes")
    assert(config.schema == Constraints.suiteSchema)
    val parsed = Constraints.suiteFrom(config, { case "codes" => ref })
    // suiteFrom orders by (chk, col_name, ppm); compare kind-by-kind
    // (RefIntegrity holds a DataFrame — compare its serializable parts)
    def key(c: Check): (String, String, Long) = c match {
      case NotNull(n, p) => ("not_null", n, p)
      case InRange(n, lo, hi, p) => ("in_range", s"$n:$lo:$hi", p)
      case MatchesRegex(n, re, p) => ("matches_regex", s"$n:$re", p)
      case Unique(ns, p) => ("unique", ns.mkString(","), p)
      case RefIntegrity(n, _, rc, p) => ("ref_integrity", s"$n:$rc", p)
    }
    assert(parsed.map(key).toSet == suite.map(key).toSet)
    // and the parsed suite validates identically to the original
    assert(Constraints.validate(df, parsed).orderBy("chk", "col_name").collect().toSeq ==
      Constraints.validate(df, suite).orderBy("chk", "col_name").collect().toSeq)
  }

  test("suites-as-data: unknown kinds and missing parameters fail loudly") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    def cfg(rows: Row*) =
      spark.createDataFrame(rows.asJava, Constraints.suiteSchema)
    val bad = cfg(Row("no_such_check", "c", null, null, null, null, null, 0L))
    assertThrows[IllegalArgumentException](Constraints.suiteFrom(bad))
    val missing = cfg(Row("in_range", "c", null, 5.0, null, null, null, 0L))
    assertThrows[IllegalArgumentException](Constraints.suiteFrom(missing))
    val noRef = cfg(Row("ref_integrity", "c", null, null, null, "t", "k", 0L))
    assertThrows[IllegalArgumentException](Constraints.suiteFrom(noRef))
  }
}
