package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical data layout for scan pruning — the 100 TB lever that costs
  * nothing at query time: parquet footers carry per-file/per-rowgroup
  * min/max, and Spark prunes files whose stats exclude the predicate.
  * Sorting on ONE column makes its stats tight but leaves every other
  * column's span full-range; a Z-ORDER (Morton) sort interleaves the key
  * bits so files stay simultaneously tight on ALL keys — multi-dim
  * predicates prune on any subset. (Same idea Delta/Iceberg OPTIMIZE
  * ZORDER applies; here expressed as a plain codegen'd expression +
  * range partitioned write, no table format needed.) */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each (non-negative
    * integral) column — bit b of column i lands at position b*m + i. A
    * flat fold of shift/mask/or terms: whole-stage-codegen'd, no UDF, and
    * replayable in plain SQL. Keys wider than `bits` bits must be
    * pre-quantized (e.g. `k % (1 << bits)` or a rank bucket): the z-curve
    * only needs locality, not injectivity. `m * bits` must fit 63 bits. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val m = cols.size
    require(m >= 2, "z-order needs at least 2 columns (use orderBy for 1)")
    require(bits > 0 && m * bits <= 63, s"$m cols x $bits bits exceeds a long")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(c.cast(LongType), b).bitwiseAND(lit(1L)),
      b * m + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-ordered parquet write: range-partition on the z-value into
    * `numFiles` files, sort within each, drop the helper column. One
    * range shuffle at ingest buys every later multi-dim filter its file
    * pruning. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Bucketed table write — the shuffle-elision lever for REPEATED joins
    * and aggregations on a stable key: rows are hash-distributed into
    * `buckets` files per partition by `bucketCols` and sorted within each
    * bucket, and the layout is recorded in the catalog. Every later
    * equi-join or groupBy on the bucket key between tables bucketed the
    * SAME way plans with NO Exchange on either side (and with the sort
    * recorded, sort-merge join skips its sorts too) — at 100 TB that
    * converts the nightly fact-to-fact join from the cluster's biggest
    * shuffle into a zip of co-located files. Bucketing beats
    * [[writeZOrdered]] when the workload is join/agg-dominated on one
    * hot key; z-order wins for multi-dim range scans.
    *
    * Catalog-backed by design (bucket metadata lives in the table
    * catalog, not the files): pass a managed-table name, optionally with
    * an explicit `path`. Read back with `spark.table(name)`. */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
      buckets: Int, path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty && buckets > 0,
      s"writeBucketed: need >=1 bucket column and buckets > 0 (got $buckets)")
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Size-targeted compaction write — the small-files cure: pick the
    * file count from the OPTIMIZER'S size estimate (plan statistics —
    * filters and column pruning already applied, no extra job) scaled
    * by an expected on-disk compression ratio, then round-robin
    * repartition so every output file lands near `targetBytes`. At
    * 100 TB ingest this is the difference between 10^8 kilobyte files
    * strangling the NameNode/listing path and evenly-sized ~256 MB
    * parquet. Returns the file count chosen. Ordering note: round-robin
    * destroys clustering — use [[writeZOrdered]] when later scans prune
    * on key ranges. */
  def writeSized(df: DataFrame, path: String, targetBytes: Long,
      compressionRatio: Double = 3.0, maxFiles: Int = 100000): Int = {
    require(targetBytes >= 1 && compressionRatio > 0)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp INSIDE BigDecimal: a stats-less plan reports Long.MaxValue
    // sizeInBytes, and BigDecimal.toInt is a narrowing wrap that would
    // turn the huge estimate into a bogus (even negative) file count
    val est = (BigDecimal(estBytes) / compressionRatio / targetBytes)
      .setScale(0, BigDecimal.RoundingMode.CEILING)
      .min(BigDecimal(maxFiles)).max(BigDecimal(1)).toInt
    val n = est
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
