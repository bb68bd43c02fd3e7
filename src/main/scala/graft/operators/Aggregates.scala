package graft.operators

import graft.core.Table
import graft.functions.InterpolatedQuantile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Grouped aggregation with the reference's exact output contract
  * (reference: native_libs/src/Analysis.cpp:640-730 `abominableGroupAggregate`,
  * aggregator structs at 83-240):
  *
  *  - output column named `<col>_<fn>` with fn in
  *    min/max/mean/median/variance/std dev/sum/length/first/last/RSI;
  *  - ALL aggregate outputs are double;
  *  - groups with fewer than `RequiredSampleCount` valid values yield null
  *    (variance/std need >=2; sum yields 0 and length counts every row,
  *    null or not);
  *  - `first`/`last` are by deterministic row order;
  *  - null keys form a group too.
  *
  * Everything maps to codegen'd built-ins except median (custom exact
  * TypedImperativeAggregate) — partial aggregation (map-side combine)
  * and AQE handle the 100 TB shuffle story.
  */
object Aggregates {

  sealed abstract class AggFn(val fnName: String) {
    /** rowIdx: deterministic order column for first/last. */
    def expr(c: Column, rowIdx: Column): Column
    def applyTo(colName: String, rowIdx: Column): Column =
      expr(col(colName), rowIdx).as(s"${colName}_$fnName")
  }

  case object Minimum extends AggFn("min") {
    def expr(c: Column, r: Column): Column = min(c).cast(DoubleType)
  }
  case object Maximum extends AggFn("max") {
    def expr(c: Column, r: Column): Column = max(c).cast(DoubleType)
  }
  case object Mean extends AggFn("mean") {
    // cast: avg(decimal) returns decimal, breaking the all-double contract
    def expr(c: Column, r: Column): Column = avg(c).cast(DoubleType)
  }
  /** Counts ALL rows in the group, nulls included (reference: Length's
    * null overload also increments — Analysis.cpp:166-183). */
  case object Length extends AggFn("length") {
    def expr(c: Column, r: Column): Column = count(lit(1)).cast(DoubleType)
  }
  case object Median extends AggFn("median") {
    def expr(c: Column, r: Column): Column = InterpolatedQuantile.medianCol(c)
  }
  /** First valid value in row order: min over (rowIdx, value) structs
    * restricted to valid rows — associative, so partial agg still applies. */
  case object First extends AggFn("first") {
    def expr(c: Column, r: Column): Column =
      min(when(c.isNotNull, struct(r.as("i"), c.as("v")))).getField("v").cast(DoubleType)
  }
  case object Last extends AggFn("last") {
    def expr(c: Column, r: Column): Column =
      max(when(c.isNotNull, struct(r.as("i"), c.as("v")))).getField("v").cast(DoubleType)
  }
  /** Empty/all-null group -> 0, not null (RequiredSampleCount=0,
    * Analysis.cpp:155-164). */
  case object Sum extends AggFn("sum") {
    def expr(c: Column, r: Column): Column = coalesce(sum(c), lit(0)).cast(DoubleType)
  }
  /** RSI = 100*mean(max(x,0)) / (mean(max(x,0)) - mean(min(x,0)))
    * (reference: Analysis.cpp:217-239). */
  case object Rsi extends AggFn("RSI") {
    def expr(c: Column, r: Column): Column = {
      // greatest/least ignore nulls in Spark, so guard explicitly: null
      // inputs must not contribute (reference treats them as missing).
      // Degenerate up==down (reference: C++ 0/0 -> NaN) yields null.
      val cd = c.cast(DoubleType)
      val up = avg(when(cd.isNotNull, greatest(cd, lit(0.0))))
      val down = avg(when(cd.isNotNull, least(cd, lit(0.0))))
      when(up - down =!= 0.0, lit(100.0) * up / (up - down))
    }
  }
  /** POPULATION variance/std (boost accumulators divide by N); need >=2
    * valid samples else null (Analysis.cpp:136-153). */
  case object Variance extends AggFn("variance") {
    def expr(c: Column, r: Column): Column = when(count(c) >= 2, var_pop(c))
  }
  case object StdDev extends AggFn("std dev") {
    def expr(c: Column, r: Column): Column = when(count(c) >= 2, stddev_pop(c))
  }

  val all: Seq[AggFn] =
    Seq(Minimum, Maximum, Mean, Length, Median, First, Last, Sum, Rsi, Variance, StdDev)

  /** Reference RelaxedAggregationRules (Tests.cpp:1183-1220): the
    * double-valued aggregations ERROR on non-numeric columns at build
    * time; only `length` applies to strings/timestamps/bools. */
  private def validateSpecs(schema: org.apache.spark.sql.types.StructType,
      specs: Seq[(String, Seq[AggFn])]): Unit =
    specs.foreach { case (c, fns) =>
      val dt = schema(c).dataType
      if (!dt.isInstanceOf[org.apache.spark.sql.types.NumericType])
        fns.find(_ != Length).foreach(f =>
          throw new IllegalArgumentException(
            s"aggregateBy: ${f.fnName} requires a numeric column, '$c' is $dt" +
              " (only length applies to non-numeric columns)"))
    }

  /** `aggregateBy keyCol [(col, [fns])]` — key column passed through, one
    * output column per (col, fn). The `table` must carry a row order if
    * First/Last are requested. */
  def aggregateBy(table: Table, key: String, specs: Seq[(String, Seq[AggFn])]): DataFrame = {
    require(specs.nonEmpty, "aggregateBy: no aggregation specs given")
    validateSpecs(table.schema, specs)
    val needsOrder = specs.exists(_._2.exists(f => f == First || f == Last))
    val base = if (needsOrder) table.indexed else table.df
    val rowIdx = if (needsOrder) col(Table.RowIdx) else monotonically_increasing_id()
    val aggs = specs.flatMap { case (c, fns) => fns.map(_.applyTo(c, rowIdx)) }
    base.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** aggregateBy over a DataFrame whose row order is DEFINED by `orderCols`
    * (a unique natural key). First/Last compare on the order tuple directly
    * (struct ordering is lexicographic), so no row index is materialized —
    * no global sort, no zipWithIndex pass; the whole query is one hash
    * aggregate. Prefer this at scale whenever a natural order key exists. */
  def aggregateByOrdered(df: DataFrame, key: String, orderCols: Seq[Column],
      specs: Seq[(String, Seq[AggFn])]): DataFrame = {
    require(specs.nonEmpty, "aggregateByOrdered: no aggregation specs given")
    validateSpecs(df.schema, specs)
    val ord = struct(orderCols: _*)
    val aggs = specs.flatMap { case (c, fns) => fns.map(_.applyTo(c, ord)) }
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }
}
