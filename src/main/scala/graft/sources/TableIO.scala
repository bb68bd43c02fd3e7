package graft.sources

import java.io.{DataInputStream, FileInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File IO with the reference's polymorphic entry points:
  * read dispatches on FILE SIGNATURE, write on EXTENSION
  * (reference: native_libs/src/IO/IO.cpp:83-99,182-232).
  *
  * Formats: the reference's columnar fast path is Feather v1; ours is
  * Parquet (the idiomatic Spark columnar format — splittable, predicate
  * pushdown, column pruning). CSV is the portable path. Feather v1
  * (FeatherV1) and XLSX (Xlsx) are single-file exchange paths, parsed
  * driver-side.
  */
object TableIO {

  sealed trait Format
  case object Parquet extends Format
  case object Csv extends Format
  case object Feather extends Format
  case object Xlsx extends Format
  case object Orc extends Format
  case object Json extends Format
  case object Avro extends Format

  /** Sniff the on-disk signature: zip magic (XLSX), "FEA1" (Feather v1),
    * "PAR1" (Parquet), "ORC" head magic CONFIRMED by the tail postscript
    * magic (a CSV whose header starts "ORCID,…" must stay CSV), a `{"`
    * prefix (JSON-lines objects — a bare '{'/'[' would misread quoted
    * CSV fields), else CSV — reference: IO/IO.cpp:182-216 (ORC/JSON
    * beyond-reference). */
  def sniff(path: String): Format = {
    val f = new java.io.File(path)
    val probe = if (f.isDirectory) {
      // Spark-written dataset directory: sniff the first part file.
      f.listFiles().find(p => p.isFile && !p.getName.startsWith(".") && !p.getName.startsWith("_"))
        .getOrElse(return Csv)
    } else f
    val in = new DataInputStream(new FileInputStream(probe))
    try {
      val magic = new Array[Byte](4)
      // read() may legally return short — loop to fill (a short read on a
      // slow stream would misclassify a real parquet file as CSV)
      var n = 0
      var eof = false
      while (n < 4 && !eof) {
        val r = in.read(magic, n, 4 - n)
        if (r < 0) eof = true else n += r
      }
      if (n < 4) Csv
      else if (magic(0) == 'P' && magic(1) == 'K') Xlsx
      else if (new String(magic, "ASCII") == "FEA1") Feather
      else if (new String(magic, "ASCII") == "PAR1") Parquet
      else if (magic(0) == 'O' && magic(1) == 'R' && magic(2) == 'C'
          && orcTailMagic(probe)) Orc
      else if (magic(0) == 'O' && magic(1) == 'b' && magic(2) == 'j'
          && magic(3) == 1) Avro
      else if (magic(0) == '{' && magic(1) == '"') Json
      else Csv
    } finally in.close()
  }

  /** ORC files end with a postscript whose final bytes are "ORC" followed
    * by the one-byte postscript length — the head bytes alone collide
    * with CSV headers like "ORCID,name". */
  private def orcTailMagic(f: java.io.File): Boolean = {
    if (f.length < 8) return false
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      raf.seek(f.length - 4)
      val tail = new Array[Byte](4)
      raf.readFully(tail)
      tail(0) == 'O' && tail(1) == 'R' && tail(2) == 'C'
    } finally raf.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = sniff(path) match {
    case Parquet => spark.read.parquet(path)
    case Csv     => readCsv(spark, path, CsvOptions())
    case Feather => FeatherV1.read(spark, path) // legacy ingest path; see FeatherV1
    case Xlsx    => graft.sources.Xlsx.read(spark, path) // single-file exchange path
    case Orc     => spark.read.orc(path)
    case Json    => spark.read.json(path) // schema inferred; timestamps stringify
    case Avro    => AvroIO.read(spark, path) // distributed per-file container scan
  }

  /** Reference CSV knobs (reference: native_libs/src/IO/csv.h:62-80):
    * header policy (take from first row / generate colN / custom names). */
  final case class CsvOptions(
      header: HeaderPolicy = HeaderFromFirstRow,
      separator: String = ",",
      inferOver50Rows: Boolean = false)
  sealed trait HeaderPolicy
  case object HeaderFromFirstRow extends HeaderPolicy
  case object GenerateColumnNames extends HeaderPolicy
  final case class CustomNames(names: Seq[String]) extends HeaderPolicy

  def readCsv(spark: SparkSession, path: String, opts: CsvOptions): DataFrame = {
    val base = spark.read
      .option("sep", opts.separator)
      .option("inferSchema", !opts.inferOver50Rows) // full-file inference unless 50-row parity asked
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("nullValue", "")
    var deduceTypes = opts.inferOver50Rows
    val headered = opts.header match {
      case HeaderFromFirstRow =>
        // Reference header naming (IO/IO.cpp:40-66): empty header cells are
        // named MISSING_<i>, and fieldCount is the max over ALL records, so
        // data rows wider than the header produce MISSING_<i> columns too
        // (the header "cell" beyond its own length reads as ""). The probe
        // costs one line-read; the ragged-width scan runs only in the
        // reference-parity mode or when the header itself has holes — the
        // clean-header fast path stays a single native Spark CSV read.
        val cells = headerCells(spark, path, opts.separator)
        val needFix = cells.exists(_.isEmpty) || opts.inferOver50Rows
        if (!needFix) base.option("header", true).csv(path)
        else {
          val m = math.max(cells.length, maxFieldCount(spark, path, opts.separator))
          val names = (0 until m).map(i =>
            if (i < cells.length && cells(i).nonEmpty) cells(i) else s"MISSING_$i")
          val wide = StructType((0 until m).map(i => StructField(s"_tmp_$i", StringType)))
          deduceTypes = true // explicit schema disables Spark inference; use the 50-row rule
          // enforceSchema skips the header line and parses positionally;
          // ragged-short rows null-pad (reference MissingField::AsNull)
          base.schema(wide).option("header", true).option("enforceSchema", true)
            .csv(path).toDF(names: _*)
        }
      case GenerateColumnNames =>
        val df = base.option("header", false).csv(path)
        df.toDF(df.columns.indices.map(i => s"col$i"): _*)
      case CustomNames(names) =>
        // reference pads short custom-name lists with colN (IO/IO.cpp:59-62)
        val df = base.option("header", false).csv(path)
        val padded = df.columns.indices.map(i =>
          if (i < names.length) names(i) else s"col$i")
        df.toDF(padded: _*)
    }
    if (deduceTypes) applyDeducedSchema(spark, headered, opts) else headered
  }

  /** First line's cells, split naively on the separator (header cells with
    * embedded quoted separators are out of parity scope). Reads one line. */
  private def headerCells(spark: SparkSession, path: String, sep: String): Array[String] =
    spark.read.text(path).take(1) match {
      case Array(row) => row.getString(0).split(java.util.regex.Pattern.quote(sep), -1)
      case _ => Array.empty
    }

  /** Max field count over all records (reference ParsedCsv.fieldCount =
    * max over rows — csv.cpp:264-270). One narrow pass; only used on the
    * parity path. */
  private def maxFieldCount(spark: SparkSession, path: String, sep: String): Int = {
    import org.apache.spark.sql.functions._
    // separators inside QUOTED fields must not count: strip "..." spans
    // (doubled "" inside them included) before splitting, else `1,"x,y"`
    // reads as 3 fields and fabricates a spurious MISSING_i column
    val unquoted = regexp_replace(col("value"), "\"([^\"]|\"\")*\"", "")
    spark.read.text(path)
      .agg(max(size(split(unquoted, java.util.regex.Pattern.quote(sep), -1))))
      .take(1).headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      .getOrElse(0)
  }

  /** Reference type deduction (reference: IO/csv.cpp:30-41,153-188): per
    * column, look at the FIRST 50 data rows only; precedence
    * TIMESTAMP > STRING > DOUBLE > INT64; empty cells are nulls and don't
    * vote. Spark's own inference scans the whole file — for files whose
    * tail diverges from the head, results differ; this reproduces the
    * reference's head-window rule, then casts (rows that fail the cast
    * become null, matching the reference's null-on-parse-failure). */
  private[sources] def applyDeducedSchema(spark: SparkSession, raw: DataFrame,
      opts: CsvOptions): DataFrame = {
    import org.apache.spark.sql.functions._
    val head = raw.limit(50).collect()
    val tsRe = "^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}(:\\d{2})?)?$".r
    val intRe = "^[+-]?\\d+$".r
    val dblRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r
    val casts = raw.schema.fields.zipWithIndex.map { case (f, i) =>
      val cells = head.flatMap(r => Option(r.get(i)).map(_.toString)).filter(_.nonEmpty)
      val dt: DataType =
        if (cells.isEmpty) StringType
        else if (cells.forall(c => tsRe.findFirstIn(c).isDefined)) TimestampType
        else if (cells.forall(c => intRe.findFirstIn(c).isDefined)) LongType
        else if (cells.forall(c => dblRe.findFirstIn(c).isDefined)) DoubleType
        else StringType
      // backtick-quote: header names may contain dots, which a bare
      // col() would parse as nested-field access
      val quoted = "`" + f.name.replace("`", "``") + "`"
      col(quoted).try_cast(dt).as(f.name) // null on parse failure (ANSI-safe)
    }
    raw.select(casts.toSeq: _*)
  }

  /** CSV writer knobs (reference: csv.cpp:414-469): header on/off,
    * quote-when-needed vs quote-all, custom separator; timestamps as %F
    * dates. */
  final case class CsvWriteOptions(
      header: Boolean = true,
      quoteAll: Boolean = false,
      separator: String = ",")

  def writeCsv(df: DataFrame, path: String, opts: CsvWriteOptions = CsvWriteOptions()): Unit = {
    import org.apache.spark.sql.functions._
    // %F timestamp rendering like the reference's generator (csv.cpp:400-411)
    val rendered = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          d.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd"))
        case _ => d
      }
    }
    rendered.write.mode("overwrite")
      .option("header", opts.header)
      .option("quoteAll", opts.quoteAll)
      .option("sep", opts.separator)
      .option("emptyValue", "")
      .csv(path)
  }

  /** Parse CSV from an in-memory string (reference: main.cpp:1306-1339). */
  def readCsvText(spark: SparkSession, text: String,
      opts: CsvOptions = CsvOptions()): DataFrame = {
    import spark.implicits._
    // same CsvOptions semantics as readCsv: 50-row reference inference
    // honored, short custom-name lists colN-padded
    val ds = spark.createDataset(text.split("\n", -1).toSeq.filter(_.nonEmpty))
    val base = spark.read
      .option("sep", opts.separator)
      .option("inferSchema", !opts.inferOver50Rows)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("nullValue", "")
    val headered = opts.header match {
      case HeaderFromFirstRow => base.option("header", true).csv(ds)
      case GenerateColumnNames =>
        val df = base.option("header", false).csv(ds)
        df.toDF(df.columns.indices.map(i => s"col$i"): _*)
      case CustomNames(names) =>
        val df = base.option("header", false).csv(ds)
        val padded = df.columns.indices.map(i =>
          if (i < names.length) names(i) else s"col$i")
        df.toDF(padded: _*)
    }
    if (opts.inferOver50Rows) applyDeducedSchema(spark, headered, opts)
    else headered
  }

  /** Int sequence column source (reference: main.cpp:721-738
    * columnNewInt64Sequence / Column.createIndex). */
  def sequenceColumn(spark: SparkSession, name: String, from: Long, to: Long,
      step: Long = 1L): DataFrame =
    spark.range(from, to, step).toDF(name)

  /** Bucketed + sorted managed table: co-locates join/agg keys at write
    * time so later equi-joins and groupBys on `bucketCols` run with NO
    * shuffle exchange (verified by plan inspection in TableIOSpec). The
    * storage-layout half of the 100 TB join story — pay the shuffle once
    * at ingest, never again. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the operational counterpart of streaming/
    * incremental ingest: thousands of kilobyte part-files turn every
    * scan's task scheduling and footer reads into the bottleneck.
    * Rewrites `inDir` into ceil(bytes / targetFileBytes) files at
    * `outDir` (distinct from `inDir`: rewrite-then-swap is the safe
    * pattern — never overwrite the data being read). Returns the target
    * file count. Uses the Hadoop FS API, so it works on any supported
    * filesystem, and coalesce (not repartition) when shrinking — a
    * compaction must not pay a full shuffle just to concatenate. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0)
    require(new org.apache.hadoop.fs.Path(inDir).toUri != new org.apache.hadoop.fs.Path(outDir).toUri,
      "compact: outDir must differ from inDir (rewrite-then-swap)")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Hive-style partitioned parquet layout: partition pruning turns
    * predicates on `partitionCols` into directory pruning. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Write dispatching on extension (csv/txt -> CSV, parquet/feather role ->
    * Parquet) — reference: IO/IO.cpp:92-99. */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv") || lower.endsWith(".txt"))
      writeCsv(df, path, CsvWriteOptions(header = header))
    else if (lower.endsWith(".xlsx"))
      graft.sources.Xlsx.write(df, path, header)
    else if (lower.endsWith(".feather"))
      FeatherV1.write(df, path)
    else if (lower.endsWith(".orc"))
      df.write.mode("overwrite").orc(path)
    else if (lower.endsWith(".avro"))
      AvroIO.write(df, path) // guarded driver-side exchange path, like Feather

    else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
      df.write.mode("overwrite").json(path)
    else
      df.write.mode("overwrite").parquet(path)
  }
}
