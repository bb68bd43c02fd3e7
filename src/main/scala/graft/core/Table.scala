package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered, distributed table facade.
  *
  * The reference Table (reference: src/Table.luna:54-96) is an eager,
  * in-memory, *order-deterministic* columnar table. Spark DataFrames are
  * lazy unordered multisets, so this facade carries an explicit row-order
  * column `__row_idx` and every order-sensitive operator (slice, shift,
  * sort stability, first/last, interpolate, horizontal concat) windows
  * over it. See SURVEY.md §7.1.
  *
  * Scale notes (100 TB):
  *  - `__row_idx` is only materialized when an order-sensitive op is used;
  *    plain filter/map/agg pipelines never pay for it — and
  *    [[Table.fromIndexed]] trusts an ingest-materialized index with no
  *    passes at all.
  *  - `zipIndexed` assigns the index with a per-partition offset scan
  *    (2 narrow passes, no shuffle) instead of a single-partition
  *    `row_number()` window.
  *  - NO operator windows over the whole table in one partition: shift
  *    and autoCorr block the index axis with ghost rows, interpolate
  *    stitches per-chunk running frames through driver-side boundary
  *    summaries, rollingInterval spans the key axis — all one hash
  *    shuffle, parallel at any n (PlanShapeSpec asserts it repo-wide).
  *    The keyed `*Within` variants stay preferable when a natural
  *    partition key exists.
  */
final class Table private[core] (private val inner: DataFrame) {
  import Table._

  /** Underlying DataFrame without the row-index bookkeeping column. */
  def df: DataFrame = if (inner.columns.contains(RowIdx)) inner.drop(RowIdx) else inner

  /** Underlying DataFrame with a materialized row index (assigning one if absent). */
  def indexed: DataFrame =
    if (inner.columns.contains(RowIdx)) inner else zipIndexed(inner)

  private def keep(newInner: DataFrame): Table = new Table(newInner)

  // ---- metadata (reference: src/Table.luna:167-187,543-544) ----
  def columnNames: Seq[String] = df.columns.toSeq
  def columnCount: Int = df.columns.length
  def rowCount: Long = df.count()
  def schema: StructType = df.schema

  // ---- projection / column surgery (reference: src/Table.luna:214-484) ----
  def at(name: String): Column = inner(name)
  def columns(names: Seq[String]): Table = keep(inner.select((names :+ RowIdx).filter(inner.columns.contains(_)).distinct.map(inner(_)): _*))
  def select(cols: Column*): Table = new Table(df.select(cols: _*))
  def addColumn(name: String, col: Column): Table = keep(inner.withColumn(name, col))

  /** Insert a column at position i (reference: src/Table.luna:248-249
    * addColumn index col). */
  def addColumnAt(i: Int, name: String, c: Column): Table = {
    // position computed against the VISIBLE columns, but the projection
    // runs on `inner` so an already-materialized row index survives
    // (building on df would silently drop it and force a re-zipIndexed
    // on the next order-sensitive op)
    val (before, after) = df.columns.splitAt(i)
    val visible = before.map(col) ++ (col(name) +: after.map(col))
    val cols = if (inner.columns.contains(RowIdx)) visible :+ col(RowIdx) else visible
    keep(inner.withColumn(name, c).select(cols.toIndexedSeq: _*))
  }

  /** Replace-or-append a column by name (reference: src/Table.luna:362-368
    * setAt) — Spark's withColumn has exactly these semantics. */
  def setAt(name: String, c: Column): Table = addColumn(name, c)

  def remove(name: String): Table = keep(inner.drop(name))

  /** Drop the column at position i (reference: src/Table.luna:457-484). */
  def removeByIndex(i: Int): Table = remove(df.columns(i))
  def rename(from: String, to: String): Table = keep(inner.withColumnRenamed(from, to))

  /** Keep only columns whose field satisfies the predicate
    * (reference: src/Table.luna:719-722 filterColumns with .isNumeric /
    * .isText column predicates). */
  def filterColumns(pred: StructField => Boolean): Table =
    new Table(df.select(df.schema.fields.filter(pred).map(f => col(f.name)).toIndexedSeq: _*))

  /** Apply a Column -> Column function to every column
    * (reference: src/Table.luna:749-752 eachColumn). */
  def eachColumn(f: (Column, StructField) => Column): Table =
    new Table(df.select(df.schema.fields.map(sf => f(col(sf.name), sf).as(sf.name)).toIndexedSeq: _*))

  /** Horizontal concat by row position (reference: src/Table.luna:278-310).
    * Implemented as an equi-join on the row index — the only faithful
    * distributed "zip" of two independently-produced tables. */
  def concat(other: Table): Table = {
    val l = indexed
    val r = other.indexed
    // rename collisions like the reference would error; we suffix instead
    val collisions = l.columns.toSet.intersect(r.columns.toSet) - RowIdx
    val rr = collisions.foldLeft(r)((d, c) => d.withColumnRenamed(c, c + "_right"))
    // FULL join: the reference pads shorter tables with nulls to the longer
    // length (tableFromColumns — Tests.cpp:1108-1123), not truncates
    new Table(l.join(rr, Seq(RowIdx), "full_outer"))
  }

  // ---- row selection (reference: src/Table.luna:602-663) ----
  /** Rows [beg, beg+count). Negative arguments throw like the reference's
    * validateSlice (Processing.cpp:323-339); the upper bound is clamped
    * rather than bounds-checked — a strict check would force a count()
    * job per call on a lazy engine (divergence documented). */
  def slice(beg: Long, count: Long): Table = {
    require(beg >= 0 && count >= 0,
      s"slice: negative bounds (beg=$beg, count=$count)")
    val ix = indexed
    // beg + count can overflow (slice(1, Long.MaxValue) = "the rest"):
    // saturate instead of wrapping to an always-false filter
    val end = if (count > Long.MaxValue - beg) Long.MaxValue else beg + count
    new Table(
      ix.filter(col(RowIdx) >= beg && col(RowIdx) < end)
        .withColumn(RowIdx, col(RowIdx) - beg))
  }
  def take(n: Long): Table = slice(0, n)
  def dropRows(n: Long): Table = {
    require(n >= 0, s"dropRows: negative count ($n)") // a negative shift
    // would break the gap-free 0-based index every order-sensitive op assumes
    val ix = indexed
    new Table(ix.filter(col(RowIdx) >= n).withColumn(RowIdx, col(RowIdx) - n))
  }

  // ---- filter / map (LQuery equivalents; see graft.expr.LQuery) ----
  def filter(cond: Column): Table = keepCompacted(inner.filter(cond))
  def each(name: String, value: Column): Table = keep(inner.withColumn(name, value))

  /** LExpr overloads: run the reference's builder type rules against this
    * table's schema (string gt/lt and mixed-type eq THROW — Tests.cpp:
    * 516-531) before applying the null-guarded filter/map forms. */
  def filter(pred: graft.expr.LExpr): Table =
    filter(pred.validate(df.schema).toFilter)
  def each(name: String, value: graft.expr.LExpr): Table =
    each(name, value.validate(df.schema).toMap)

  /** Row-removing ops compact the row order (the reference renumbers
    * positions after removal — Processing.cpp:376-495): drop the stale,
    * gapped index and let it be reassigned lazily. Filters are narrow, so
    * the surviving rows' relative order — including any upstream sort —
    * is preserved into the reassignment. */
  private def keepCompacted(d: DataFrame): Table =
    new Table(if (d.columns.contains(RowIdx)) d.drop(RowIdx) else d)

  // ---- sort (reference: src/Table.luna:806-952, Sort.cpp:131-216) ----
  /** Multi-key lexicographic STABLE sort. Spark's sort is not stable, so the
    * prior row index is appended as the final ascending tie-break key, then
    * the index is reassigned to reflect the new order. */
  def sortBy(keys: Seq[SortKey]): Table = {
    val ix = indexed
    val sortCols = keys.map(_.toColumn(ix)) :+ col(RowIdx).asc
    val sorted = ix.orderBy(sortCols: _*).drop(RowIdx)
    new Table(zipIndexed(sorted))
  }

  // ---- null handling (reference: Processing.cpp:376-495) ----
  def dropNa(): Table = keepCompacted(inner.na.drop("any", df.columns))
  def dropNaAt(colName: String): Table = keepCompacted(inner.na.drop(Seq(colName)))
  def fillNa(value: Any): Table = {
    // Reference coerces the fill value per column type (int<->double<->string,
    // numbers stringified for string cols) — Processing.cpp:561-609.
    // Fold over `inner` (skipping the index column) so an already-materialized
    // __row_idx survives without re-attaching an attribute from a foreign plan.
    val filled = inner.schema.fields.filter(_.name != RowIdx).foldLeft(inner) { (d, f) =>
      coerceFill(value, f.dataType) match {
        case Some(v) => d.withColumn(f.name, coalesce(col(f.name), lit(v).cast(f.dataType)))
        case None    => d
      }
    }
    keep(filled)
  }
  def fillNaAt(colName: String, value: Any): Table = {
    val dt = df.schema(colName).dataType
    coerceFill(value, dt) match {
      case Some(v) => keep(inner.withColumn(colName, coalesce(col(colName), lit(v).cast(dt))))
      case None    => this
    }
  }

  /** Linear interpolation of interior null runs; leading nulls take the first
    * valid value, trailing nulls the last valid; int64 stays integral via
    * storage-type lerp (truncation). Reference: Processing.cpp:271-374,
    * lerp = (1-t)*v0 + t*v1 (Core/Common.h:146-149). Window composition —
    * no UDF, stays in codegen. */
  def interpolate(): Table = {
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case LongType | DoubleType | IntegerType | TimestampType => true
      case _ => false
    })
    new Table(stitchInterpolate(indexed, numeric.toSeq))
  }

  /** Single-column interpolate with the reference's type check: string
    * columns are an error (reference: Processing.cpp:271-374 rejects
    * non-numeric; Tests.cpp interpolation goldens). */
  def interpolateAt(colName: String): Table = {
    val f = df.schema(colName)
    f.dataType match {
      case LongType | DoubleType | IntegerType | TimestampType =>
        new Table(stitchInterpolate(indexed, Seq(f)))
      case other => throw new IllegalArgumentException(
        s"interpolate: unsupported column type $other for '$colName'")
    }
  }

  /** Whole-table interpolate, 100 TB shape (SURVEY §4): cut the row order
    * into index chunks; per chunk compute RUNNING prev/next-valid frames
    * (parallel, one hash shuffle on the chunk id); reduce each chunk to a
    * 2-struct boundary summary (first/last valid (idx, value)); prefix-fill
    * those summaries driver-side; broadcast them back as a map literal.
    * No single-partition WindowExec anywhere — the only global step touches
    * the chunk summaries (count capped at 2^18, see below), not N rows. */
  private def stitchInterpolate(ix: DataFrame, fields: Seq[StructField]): DataFrame = {
    if (fields.isEmpty) return ix
    // gap-free index invariant: max(RowIdx)+1 == count, and count() can
    // fold to source metadata where max() always scans
    val n = ix.count()
    if (n == 0) return ix
    val target = ix.sparkSession.sparkContext.defaultParallelism.toLong * 4
    // chunk COUNT is capped so the boundary-summary collect stays bounded
    // driver-side (≤ MaxChunks rows of 2 structs per field) even at
    // 10^13-row tables; past the cap chunks grow beyond BlockSize and the
    // per-chunk window sorts more rows per task (spillable). A table big
    // enough to feel that should interpolate per key (interpolateWithin)
    // — a GLOBAL row-order interpolate at that size is order-serial by
    // definition.
    val MaxChunks = 1L << 18
    val chunkSize = math.max(
      (n + MaxChunks - 1) / MaxChunks,
      math.min(BlockSize, math.max(1024L, (n + target - 1) / target)))
    val withChunk = ix.withColumn(BlockCol, floor(col(RowIdx) / chunkSize).cast(LongType))

    def valueOf(f: StructField): Column =
      if (f.dataType == TimestampType) unix_micros(col(f.name)) else col(f.name)

    // ONE aggregation job collects every column's per-chunk boundaries.
    val aggs = fields.flatMap { f =>
      val vd = valueOf(f).cast(DoubleType)
      Seq(min(when(vd.isNotNull, struct(col(RowIdx), vd))).as(s"__first_${f.name}"),
          max(when(vd.isNotNull, struct(col(RowIdx), vd))).as(s"__last_${f.name}"))
    }
    val boundRows = withChunk.groupBy(col(BlockCol)).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getLong(0))

    def pairAt(r: Row, o: Int): Option[(Long, Double)] =
      Option(r.getStruct(o)).map(s => (s.getLong(0), s.getDouble(1)))

    val filled = fields.zipWithIndex.foldLeft(withChunk) { case (d, (f, fi)) =>
      // Driver-side prefix fill: last valid strictly before / first strictly
      // after each chunk. An entry is emitted ONLY for chunks whose edge row
      // is null (a null run crosses the boundary) — the broadcast map stays
      // tiny even when the table has millions of chunks.
      var run: Option[(Long, Double)] = None
      val prevOf = boundRows.flatMap { r =>
        val c = r.getLong(0)
        val first = pairAt(r, 1 + fi * 2)
        val entry =
          if (first.forall(_._1 > c * chunkSize)) run.map(c -> _) else None
        pairAt(r, 2 + fi * 2).foreach(p => run = Some(p))
        entry
      }.toMap
      run = None
      val nextOf = boundRows.reverse.flatMap { r =>
        val c = r.getLong(0)
        val chunkEnd = math.min((c + 1) * chunkSize, n) - 1
        val last = pairAt(r, 2 + fi * 2)
        val entry =
          if (last.forall(_._1 < chunkEnd)) run.map(c -> _) else None
        pairAt(r, 1 + fi * 2).foreach(p => run = Some(p))
        entry
      }.toMap
      d.withColumn(f.name, interpolatedValue(f, valueOf(f), prevOf, nextOf))
    }
    filled.drop(BlockCol)
  }

  /** Per-row interpolated value: within-chunk running frames coalesced with
    * the broadcast cross-chunk boundary maps, then the reference's lerp /
    * edge-clamp / storage-type truncation rules. */
  private def interpolatedValue(f: StructField, v: Column,
      prevOf: Map[Long, (Long, Double)], nextOf: Map[Long, (Long, Double)]): Column = {
    def fromMap(m: Map[Long, (Long, Double)]): (Column, Column) =
      if (m.isEmpty) (lit(null).cast(LongType), lit(null).cast(DoubleType))
      else {
        val e = element_at(typedLit(m), col(BlockCol))
        (e.getField("_1"), e.getField("_2"))
      }
    val vd = v.cast(DoubleType)
    // Both frames are RUNNING (unboundedPreceding..current): Spark streams
    // them in O(n). The "next valid" side runs over the DESCENDING order —
    // a rowsBetween(0, unboundedFollowing) frame would be rescanned from
    // each row to the end (O(n^2): 870 s on 100k rows, measured).
    val wPrev = Window.partitionBy(col(BlockCol))
      .orderBy(col(RowIdx).asc).rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col(BlockCol))
      .orderBy(col(RowIdx).desc).rowsBetween(Window.unboundedPreceding, 0)
    val (pI0, pV0) = fromMap(prevOf)
    val (nI0, nV0) = fromMap(nextOf)
    val pV = coalesce(last(vd, ignoreNulls = true).over(wPrev), pV0)
    val pI = coalesce(last(when(vd.isNotNull, col(RowIdx)), ignoreNulls = true).over(wPrev), pI0)
    val nV = coalesce(last(vd, ignoreNulls = true).over(wNext), nV0)
    val nI = coalesce(last(when(vd.isNotNull, col(RowIdx)), ignoreNulls = true).over(wNext), nI0)
    val t = (col(RowIdx) - pI).cast(DoubleType) / (nI - pI).cast(DoubleType)
    val lerped = (lit(1.0) - t) * pV + t * nV
    val interior = f.dataType match {
      case DoubleType => lerped
      case _          => lerped.cast(LongType) // storage-type truncation, reference parity
    }
    val res = when(pV.isNull, nV)   // leading run -> first valid
      .when(nV.isNull, pV)          // trailing run -> last valid
      .otherwise(interior)
    val filledVal = f.dataType match {
      case TimestampType => timestamp_micros(res.cast(LongType))
      case dt            => res.cast(dt)
    }
    // non-null rows keep the ORIGINAL value — routing them through the
    // double-typed frame would corrupt longs beyond 2^53 (the Within
    // variant already preserves originals; both paths must agree)
    when(v.isNotNull, col(f.name)).otherwise(filledVal)
  }

  /** Per-key interpolate: null runs fill within each partition key only —
    * parallel across keys with no chunk-stitch machinery. Edge runs clamp
    * within the key's own first/last valid. */
  def interpolateWithin(partitionCols: Seq[Column]): Table = {
    val ix = indexed
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case LongType | DoubleType | IntegerType | TimestampType => true
      case _ => false
    })
    new Table(numeric.foldLeft(ix) { (d, f) => interpolateCol(d, f, partitionCols) })
  }

  private def interpolateCol(d: DataFrame, f: StructField, parts: Seq[Column]): DataFrame = {
    val c = f.name
    val isTs = f.dataType == TimestampType
    val v = if (isTs) unix_micros(col(c)) else col(c)
    // Both frames are RUNNING (unboundedPreceding..current): Spark streams
    // them in O(n). The "next valid" side runs over the DESCENDING order —
    // a rowsBetween(0, unboundedFollowing) frame would be rescanned from
    // each row to the end (O(n^2): 870 s on 100k rows, measured).
    val wPrev = Window.partitionBy(parts: _*)
      .orderBy(col(RowIdx).asc).rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(parts: _*)
      .orderBy(col(RowIdx).desc).rowsBetween(Window.unboundedPreceding, 0)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevI = last(when(v.isNotNull, col(RowIdx)), ignoreNulls = true).over(wPrev)
    val nextV = last(v, ignoreNulls = true).over(wNext)
    val nextI = last(when(v.isNotNull, col(RowIdx)), ignoreNulls = true).over(wNext)
    val t = (col(RowIdx) - prevI).cast(DoubleType) / (nextI - prevI).cast(DoubleType)
    val lerped = (lit(1.0) - t) * prevV.cast(DoubleType) + t * nextV.cast(DoubleType)
    val interior = f.dataType match {
      case DoubleType => lerped
      case _          => lerped.cast(LongType) // storage-type truncation, reference parity
    }
    val res = when(v.isNotNull, v)
      .when(prevV.isNull, nextV)   // leading run -> first valid
      .when(nextV.isNull, prevV)   // trailing run -> last valid
      .otherwise(interior)
    val typed = f.dataType match {
      case TimestampType => timestamp_micros(res.cast(LongType))
      case dt            => res.cast(dt)
    }
    d.withColumn(c, typed)
  }

  // ---- shift (reference: Processing.cpp:534-559) ----
  /** Lag/lead a column by n rows (vacated slots null), appended as
    * `<col>_shift_<n>`.
    *
    * Scale shape: a bare `Window.orderBy(idx)` funnels the whole table
    * through ONE partition. Instead, the gap-free row index is cut into
    * fixed blocks; each row is also copied into every neighbor block whose
    * rows' lag/lead frame reaches it (|periods| ghost rows per edge), the
    * window runs per block, and only home-block copies are kept. One hash
    * shuffle of ~(1 + |periods|/B) x rows, parallel at any scale. */
  def shift(colName: String, periods: Int): Table = {
    val ix = indexed
    val out = s"${colName}_shift_$periods"
    val back = math.max(periods, 0).toLong
    val fwd = math.max(-periods, 0).toLong
    val g = blockedByIndex(ix, back, fwd)
    val w = Window.partitionBy(col(BlockCol)).orderBy(col(RowIdx))
    keep(g
      .withColumn(out, shiftExpr(colName, periods, w))
      .filter(col(BlockCol) === homeBlock)
      .drop(BlockCol))
  }

  /** Per-key shift: lag/lead within each partition key, fully parallel
    * (one shuffle on the key, then narrow). The 100 TB-shaped variant. */
  def shiftWithin(colName: String, periods: Int, partitionCols: Seq[Column],
      orderCols: Seq[Column]): Table = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    keep(inner.withColumn(s"${colName}_shift_$periods", shiftExpr(colName, periods, w)))
  }

  private def shiftExpr(colName: String, periods: Int,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    if (periods >= 0) lag(col(colName), periods).over(w)
    else lead(col(colName), -periods).over(w)

  /** Duplicate each row into every index block that a row-positional window
    * reaching `back` rows backward / `fwd` rows forward may need it from:
    * row j is an input to rows [j-fwd, j+back], i.e. blocks
    * floor((j-fwd)/B)..floor((j+back)/B) — `explode(sequence(...))` handles
    * reaches beyond one block automatically. Requires the gap-free 0..n-1
    * index (an invariant of every Table op), so positional offsets equal
    * index offsets inside a block's ghost-padded consecutive index range.
    * Callers filter ghosts back out with `BlockCol === homeBlock`; Catalyst
    * cannot push that filter below the window because it references the
    * order column, not just the partition key. */
  private def blockedByIndex(d: DataFrame, back: Long, fwd: Long): DataFrame = {
    val lo = greatest(floor((col(RowIdx) - fwd) / BlockSize).cast(LongType), lit(0L))
    val hi = floor((col(RowIdx) + back) / BlockSize).cast(LongType)
    d.withColumn(BlockCol, explode(sequence(lo, hi)))
  }

  private def homeBlock: Column = floor(col(RowIdx) / BlockSize).cast(LongType)

  // ---- materialization / preview (reference: src/Table.luna:502-522,
  // 665-673: toList, toText, toJSON with a <=1000-row preview cap) ----
  /** First `n` rows as local Rows, in row order. */
  def toList(n: Int = 1000): Seq[Row] =
    indexed.orderBy(col(RowIdx)).limit(n).drop(RowIdx).collect().toSeq

  /** First `n` rows rendered as a text table (reference toText preview). */
  def toText(n: Int = 20): String = {
    val rows = toList(n)
    val header = df.columns.toSeq
    val cells = header +: rows.map(_.toSeq.map(v => if (v == null) "null" else v.toString))
    val widths = header.indices.map(i => cells.map(_(i).length).max)
    cells.map(r => r.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString(" | "))
      .mkString("\n")
  }

  /** First `n` rows as a JSON array string (reference toJSON preview). */
  def toJsonString(n: Int = 1000): String =
    indexed.orderBy(col(RowIdx)).limit(n).drop(RowIdx)
      .toJSON.collect().mkString("[", ",", "]")

  /** Write through the extension-dispatching writer (csv/txt -> CSV,
    * xlsx -> XLSX, feather -> Feather v1, else Parquet) — reference
    * Table.write (src/Table.luna:148-149). */
  def write(path: String): Unit = graft.sources.TableIO.write(df, path)

  // ---- equality (reference: main.cpp:1064-1071 tableEquals ->
  // arrow::Table::Equals: schema AND per-row values in ROW ORDER) ----
  /** Ordered table equality. Schema (names + types, in order) must match;
    * then one row-index equi-join compares every column null-safely —
    * presence markers catch row-count mismatches that a full join's nulls
    * would mask. One shuffle; no driver-side collect. */
  def equalsTo(other: Table): Boolean = {
    val sa = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val sb = other.df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    if (sa != sb) return false
    val l = indexed.withColumn("__lp", lit(true))
    val r0 = other.indexed.withColumn("__rp", lit(true))
    val rr = df.columns.foldLeft(r0)((d, c) => d.withColumnRenamed(c, c + "__r"))
    val joined = l.join(rr, Seq(RowIdx), "full")
    val allEq = df.columns.map(c => col(c) <=> col(c + "__r"))
      .foldLeft(col("__lp").isNotNull && col("__rp").isNotNull)(_ && _)
    joined.filter(!allEq).limit(1).isEmpty
  }

  // ---- groupBy to lists (reference: Processing.cpp:611-692) ----
  /** Group on one key column; every other column becomes a list of the
    * group's values in the table's row order (the reference builds each
    * group's ListArray from a row-order permutation). Null keys form a
    * group like any other. One shuffle on the key, map-side combined.
    *
    * Order and nulls: `collect_list` is order-nondeterministic across
    * partitions and DROPS nulls, so each value rides in as
    * struct(rowIdx, struct(v)) — the outer struct is never null, the
    * lexicographic sort_array restores row order deterministically, and
    * the inner struct carries null values through. Group output order is
    * left to the caller (the reference emits hash order). */
  def groupByToLists(keyCol: String): Table = {
    val ix = indexed
    val others = df.columns.filterNot(_ == keyCol)
    val aggs = others.map { c =>
      transform(
        sort_array(collect_list(struct(col(RowIdx).as("i"), struct(col(c).as("v")).as("w")))),
        x => x("w")("v")).as(c)
    }
    new Table(ix.groupBy(col(keyCol)).agg(aggs.head, aggs.tail.toIndexedSeq: _*))
  }

  // ---- ungroup (reference: Processing.cpp:694-819) ----
  /** Split a string column on a separator and explode — each other column's
    * value replicated per element; rows with a null string are dropped
    * (`explode`, not `explode_outer`, matches). */
  def ungroupSplittingOn(colName: String, sep: String): Table = {
    val exploded = df.withColumn(colName, explode(split(col(colName), java.util.regex.Pattern.quote(sep))))
    new Table(exploded)
  }

  /** `ungroupSplittingOn` variant that also emits the element position —
    * gives downstream ops (and the oracle compare) a deterministic
    * within-row order. */
  def ungroupSplittingOnPos(colName: String, sep: String, posCol: String): Table = {
    val others = df.columns.filter(_ != colName).map(col)
    val exploded = df.select(
      (others.toIndexedSeq :+ posexplode(split(col(colName), java.util.regex.Pattern.quote(sep)))
        .as(Seq(posCol, colName))): _*)
    new Table(exploded)
  }

  /** Pivot to wide format (beyond the reference): group on `groupCol`,
    * one output column per `values` entry of `pivotCol`. Explicit values
    * keep the schema deterministic AND skip the distinct-values job
    * Spark otherwise runs — at 100 TB always pass them. */
  def pivotAgg(groupCol: String, pivotCol: String, values: Seq[Any],
      aggExpr: Column): Table =
    new Table(df.groupBy(col(groupCol)).pivot(pivotCol, values).agg(aggExpr))

  /** Unpivot/melt (beyond the reference): `ids` stay, each column in
    * `values` becomes a (varName, valName) row — the long-format reshape.
    * Values must share (or be cast to) a common type; Spark's native
    * `unpivot` plans as an Expand (narrow, no shuffle, n_values rows per
    * input row). */
  def melt(ids: Seq[String], values: Seq[String], varName: String, valName: String): Table =
    new Table(df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName))

  // ---- native-Spark aggregation extensions (beyond the reference) ----
  def rollup(cols: Column*): org.apache.spark.sql.RelationalGroupedDataset = df.rollup(cols: _*)
  def cube(cols: Column*): org.apache.spark.sql.RelationalGroupedDataset = df.cube(cols: _*)

  def union(other: Table): Table = new Table(df.unionByName(other.df))
  def except(other: Table): Table = new Table(df.except(other.df))
  def intersect(other: Table): Table = new Table(df.intersect(other.df))
  def distinct(): Table = new Table(df.distinct())
  def join(other: Table, keys: Seq[String], how: String = "inner"): Table =
    new Table(df.join(other.df, keys, how))

  def toDF: DataFrame = df
}

object Table {
  /** Bookkeeping column carrying the deterministic row order. */
  val RowIdx = "__row_idx"

  /** Wrap a DataFrame whose row order is defined by `orderKeys` (must be a
    * total order for deterministic results). Assigns the index scalably:
    * range-partition + sort-within-partitions + per-partition offset scan. */
  def fromDF(df: DataFrame, orderKeys: Seq[Column]): Table = {
    val sorted =
      if (orderKeys.isEmpty) df
      else df.orderBy(orderKeys: _*)
    new Table(zipIndexed(sorted))
  }

  /** Wrap a DataFrame treating its current (file/partition) order as the row
    * order — matches the reference's "order as read" semantics. */
  def fromOrdered(df: DataFrame): Table = new Table(zipIndexed(df))

  /** Wrap without any order (order-sensitive ops will assign one lazily). */
  def of(df: DataFrame): Table = new Table(df)

  /** Wrap a DataFrame whose `idxCol` ALREADY holds a gap-free 0-based
    * row index (ingest-produced, e.g. a sequence column written at ETL
    * time). Skips the sort + index-assignment passes entirely — the
    * scale path when the order is materialized in storage. The caller
    * owns the gap-free invariant; order-sensitive ops are undefined if
    * it does not hold. */
  def fromIndexed(df: DataFrame, idxCol: String): Table =
    new Table(df.withColumn(RowIdx, col(idxCol).cast(LongType)).drop(idxCol)
      .select(col(RowIdx) +: df.columns.filterNot(_ == idxCol).map(col).toIndexedSeq: _*))

  def read(spark: SparkSession, path: String): Table =
    fromOrdered(graft.sources.TableIO.read(spark, path))

  /** Distributed zipWithIndex: 2 narrow passes (count per partition, then
    * offset add via broadcast map), no shuffle — unlike `row_number()
    * over ()` which would funnel all rows through one partition, and
    * unlike `rdd.zipWithIndex` which deserializes every row out of
    * Tungsten. `monotonically_increasing_id` is `pid << 33 | counter`, so
    * its low 33 bits ARE the within-partition position.
    *
    * The input plan is localCheckpoint'ed first: both passes must see the
    * SAME partition layout, but a re-executed range shuffle re-samples its
    * bounds (seeded by fresh RDD ids) and AQE may coalesce differently, so
    * without pinning, the offsets collected in pass 1 can misalign with the
    * layout pass 2 executes over. Establishing a global row order is
    * inherently a materialization point; the checkpoint is that point. */
  private[graft] def zipIndexed(df: DataFrame): DataFrame = {
    val pinned = df.localCheckpoint()
    val withPid = pinned
      .withColumn(PosInPart, monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .withColumn(PartId, spark_partition_id())
    val counts = withPid.groupBy(PartId).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).dropRight(1)
    val offsetOf: Map[Int, Long] = counts.map(_._1).zip(offsets).toMap
    // map literal keeps the expression O(1)-deep at any partition count
    val offsetExpr =
      if (offsetOf.isEmpty) lit(0L)
      else element_at(typedLit(offsetOf), col(PartId))
    withPid
      .withColumn(RowIdx, (offsetExpr + col(PosInPart)).cast(LongType))
      .drop(PosInPart, PartId)
  }

  private val PosInPart = "__pos_in_part"
  private val PartId = "__part_id"

  /** Block size for [[Table.blockedByIndex]] and the interpolate chunk
    * stitch: large enough that boundary duplication is negligible, small
    * enough that even modest tables parallelize and a 100 TB table yields
    * millions of independent blocks. */
  private[core] val BlockSize = 1L << 16
  private[core] val BlockCol = "__block"

  /** Reference fill-value coercion (Processing.cpp:561-609): numbers fill
    * numeric columns (with int<->double casts), anything stringifies into
    * string columns; mismatches are skipped. */
  private def coerceFill(value: Any, dt: DataType): Option[Any] = (value, dt) match {
    case (v: Long, LongType)      => Some(v)
    case (v: Int, LongType)       => Some(v.toLong)
    case (v: Double, LongType)    => Some(v.toLong)
    case (v: Long, DoubleType)    => Some(v.toDouble)
    case (v: Int, DoubleType)     => Some(v.toDouble)
    case (v: Double, DoubleType)  => Some(v)
    case (v: String, StringType)  => Some(v)
    case (v: Long, StringType)    => Some(v.toString)
    case (v: Int, StringType)     => Some(v.toString)
    case (v: Double, StringType)  => Some(v.toString)
    case (v: String, LongType)    => scala.util.Try(v.trim.toLong).toOption
    case (v: String, DoubleType)  => scala.util.Try(v.trim.toDouble).toOption
    case _ => None
  }
}

/** One sort key: expression + direction + null placement
  * (reference: src/Table.luna:9-27, Sort.cpp:131-216). */
final case class SortKey(name: String, ascending: Boolean = true, nullsFirst: Boolean = true) {
  def toColumn(df: DataFrame): Column = (ascending, nullsFirst) match {
    case (true, true)   => df(name).asc_nulls_first
    case (true, false)  => df(name).asc_nulls_last
    case (false, true)  => df(name).desc_nulls_first
    case (false, false) => df(name).desc_nulls_last
  }
}
