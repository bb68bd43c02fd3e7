package graft

import graft.core.{SortKey, Table}
import graft.expr.LQuery
import graft.operators.{Aggregates => A, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2. Every query:
  *  - reads the driver's parquet tables under `dir`,
  *  - ends in a deterministic total ORDER BY (mirrored in the oracle SQL),
  *  - rounds floating aggregates (both sides) so double summation order
  *    cannot flip the hash.
  */
object SparkEntry {

  // ---- table readers -------------------------------------------------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * long (nanosAsLong). Normalize to a microsecond TimestampNTZ — the
    * same truncation DuckDB's TIMESTAMP_NS -> TIMESTAMP cast applies. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else raw
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ---- the operator inventory ----------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++
    graft.queries.ParityQueries.queries ++ graft.queries.PipelineQueries.queries ++
    graft.queries.SurfaceQueries.queries ++ graft.queries.SketchQueries.queries

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.7 grouped aggregation over built-ins (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          // price totals pass 5e10 at sf1: floor-cents carriers (the
          // q_eqdepth rule) — round(sum,4) would need 16 sig digits
          sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("base_price_cents"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("disc_price_cents"),
          round(avg(col("l_quantity")), 6).as("avg_qty"), // integer-valued: sums exact
          // 2-decimal data: a group mean can sit ON a 6th-decimal rounding
          // midpoint where ulp-different summation orders round apart —
          // round the sum first (the project rule from q_rolling)
          round(round(sum(col("l_discount")), 4) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // q1_agg with DECIMAL(38,4) aggregation — the exact-total mode for
    // scale: double sums differ in their last representable digit across
    // summation orders (measured at sf1: 4th-decimal drift at 1e10-1e11
    // magnitudes that round(x,4) cannot absorb), while per-row
    // double->decimal cast is deterministic in both engines (verified on
    // 1M random doubles) and decimal addition is order-independent —
    // hash-exact at ANY scale and parallelism. Means are exact too:
    // round(x, 6) of a double is cross-engine UNSAFE precisely when the
    // true mean sits on a 6th-decimal midpoint (a 4-decimal sum over a
    // round count lands there often — measured at sf1 on q_resample), so
    // the mean is emitted in MICRO-UNITS via pure integral arithmetic:
    // round_half_up(100·S/n) = (200·S + n) div (2·n) where S is the
    // sum's exact scale-4 unscaled value. Spark `div` on DECIMAL(38,0)
    // and DuckDB HUGEINT `//` are both exact at any corpus scale.
    // ALL exact totals leave as BIGINT micro-units (graft.queries.Exact):
    // the driver hash is representation-sensitive on raw DECIMAL columns
    // (CORRECTNESS_r06: rows_match:true/hash_match:false on all 11
    // decimal emitters) while BIGINT hashes clean on both engines.
    "q1_agg_exact" -> ((s, dir) => {
      val dec = DecimalType(38, 4)
      def microMean(sumCol: String, nCol: String) = expr(
        s"CAST((CAST($sumCol * 10000 AS DECIMAL(38,0)) * 200 + $nCol) div (2 * $nCol) AS BIGINT)")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
            .as("sum_disc_price"),
          sum(col("l_discount").cast(dec)).as("sum_disc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          graft.queries.Exact.micros(col("sum_qty")).as("sum_qty_micros"),
          graft.queries.Exact.micros(col("sum_base_price")).as("sum_base_price_micros"),
          graft.queries.Exact.micros(col("sum_disc_price")).as("sum_disc_price_micros"),
          microMean("sum_qty", "count_order").as("avg_qty_micros"),
          microMean("sum_disc", "count_order").as("avg_disc_micros"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.4 LQuery filter with any-referenced-null-excludes semantics
    "q_filter" -> ((s, dir) => {
      import LQuery._
      val pred = (at("l_quantity") < lit(14.0)) && (at("l_discount") > lit(0.05))
      Table.of(t(s, dir, "lineitem"))
        .filter(pred) // typed overload: builder type rules run at bind
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .toDF
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
        // order by every output column so tie order can't flip the hash
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    }),

    // §2.4 LQuery map/each: arithmetic, ternary, calendar fields, int div/mod
    "q_map" -> ((s, dir) => {
      import LQuery._
      val revenue = at("l_extendedprice") * (lit(1.0) - at("l_discount"))
      val bigQty = condition(at("l_quantity") > lit(25.0), lit(1L), lit(0L))
      Table.of(t(s, dir, "lineitem"))
        .each("revenue", round(revenue.toMap, 4))
        .each("ship_year", at("l_shipdate").year_.toMap)
        .each("ship_month", at("l_shipdate").month_.toMap)
        .each("ship_day", at("l_shipdate").day.toMap)
        .each("half_line", at("l_linenumber").divLong(lit(2L)).toMap)
        .each("line_mod", (at("l_linenumber") % lit(2L)).toMap)
        .each("big_qty", bigQty.toMap)
        .select(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("ship_year"),
          col("ship_month"), col("ship_day"), col("half_line"), col("line_mod"), col("big_qty"))
        .toDF
        // total order over all output columns (duplicate (okey, lineno) keys)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"),
          col("ship_year"), col("ship_month"), col("ship_day"), col("big_qty"))
    }),

    // §2.6 multi-key stable sort (order surfaced as explicit rank column)
    "q_sort" -> ((s, dir) => {
      Table.fromDF(t(s, dir, "orders"), Seq(col("o_orderkey")))
        .sortBy(Seq(SortKey("o_orderpriority", ascending = true, nullsFirst = true),
                    SortKey("o_totalprice", ascending = false, nullsFirst = false)))
        .indexed
        .withColumnRenamed(Table.RowIdx, "rank")
        .select(col("rank"), col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice"), 4).as("o_totalprice"))
        .orderBy(col("rank"))
    }),

    // §2.3 slice over the defined row order
    "q_slice" -> ((s, dir) => {
      Table.fromDF(t(s, dir, "orders"), Seq(col("o_orderkey")))
        .slice(100, 50)
        .indexed
        .withColumnRenamed(Table.RowIdx, "pos")
        .select(col("pos"), col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("pos"))
    }),

    // §2.3 shift (lag) over the row order
    "q_shift" -> ((s, dir) => {
      Table.fromDF(events(s, dir), Seq(col("event_id")))
        .shift("value", 1)
        .indexed
        .select(col("event_id"), col("value"), col("value_shift_1"))
        .orderBy(col("event_id"))
    }),

    // §2.5 native-Spark extension: 3-way join + agg (TPC-H Q3 shape);
    // customer is a broadcast-able dim at any scale; the fact-to-fact
    // lineitem⋈orders leg reads the session's bucketed layout
    // (BucketedTables: both sides bucketed+sorted on the order key), so
    // the join AND the (l_orderkey, o_orderdate) aggregation reuse the
    // bucket partitioning — ZERO shuffle exchanges in the whole plan
    // (asserted in PlanShapeSpec). At 100 TB this is the nightly
    // fact-join shape bucketing exists for.
    "q_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = graft.queries.BucketedTables.ordersByOrderkey(s, dir)
      val li = graft.queries.BucketedTables.lineitemByOrderkey(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    // §2.6 top-k = sort + take (TakeOrderedAndProject physical plan)
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    })
  )

  // ---- oracle SQL (DuckDB dialect, same table names) -------------------
  def oracleSql: Map[String, String] = baseOracle ++
    graft.queries.ParityQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql ++
    graft.queries.SurfaceQueries.oracleSql ++ graft.queries.SketchQueries.oracleSql

  private val baseOracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS base_price_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS disc_price_cents,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(round(sum(l_discount), 4) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q1_agg_exact" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(CAST(l_quantity AS DECIMAL(38,4))) AS sum_qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS sum_base_price,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS sum_disc_price,
        |    sum(CAST(l_discount AS DECIMAL(38,4))) AS sum_disc,
        |    count(*) AS count_order
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum_qty * 10000 AS HUGEINT) AS BIGINT) AS sum_qty_micros,
        |  CAST(CAST(sum_base_price * 10000 AS HUGEINT) AS BIGINT) AS sum_base_price_micros,
        |  CAST(CAST(sum_disc_price * 10000 AS HUGEINT) AS BIGINT) AS sum_disc_price_micros,
        |  CAST((CAST(sum_qty * 10000 AS HUGEINT) * 200 + count_order)
        |       // (2 * count_order) AS BIGINT) AS avg_qty_micros,
        |  CAST((CAST(sum_disc * 10000 AS HUGEINT) * 200 + count_order)
        |       // (2 * count_order) AS BIGINT) AS avg_disc_micros,
        |  count_order
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity < 14.0 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        |  year(l_shipdate) AS ship_year,
        |  month(l_shipdate) AS ship_month,
        |  day(l_shipdate) AS ship_day,
        |  l_linenumber // 2 AS half_line,
        |  l_linenumber % 2 AS line_mod,
        |  CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END AS big_qty
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, ship_year, ship_month,
        |  ship_day, big_qty""".stripMargin,

    "q_sort" ->
      """SELECT row_number() OVER (ORDER BY o_orderpriority ASC NULLS FIRST,
        |                                   o_totalprice DESC NULLS LAST,
        |                                   o_orderkey ASC) - 1 AS rank,
        |  o_orderkey, o_orderpriority, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |ORDER BY rank""".stripMargin,

    "q_slice" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) - 101 AS pos,
        |  o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,

    "q_shift" ->
      """SELECT event_id, value,
        |  lag(value, 1) OVER (ORDER BY event_id) AS value_shift_1
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin
  )
}
