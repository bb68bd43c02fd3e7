package graft.sources

import java.io.{DataInputStream, FileInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File IO with the reference's polymorphic entry points:
  * read dispatches on FILE SIGNATURE, write on EXTENSION
  * (reference: native_libs/src/IO/IO.cpp:83-99,182-232).
  *
  * Formats: the reference's columnar fast path is Feather v1; ours is
  * Parquet (the idiomatic Spark columnar format — splittable, predicate
  * pushdown, column pruning). CSV is the portable path. XLSX is out of
  * core scope (the reference itself makes it a build option).
  */
object TableIO {

  sealed trait Format
  case object Parquet extends Format
  case object Csv extends Format
  case object Feather extends Format
  case object Xlsx extends Format

  /** Sniff the on-disk signature: zip magic (XLSX), "FEA1" (Feather v1),
    * "PAR1" (Parquet), else CSV — reference: IO/IO.cpp:182-216. */
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
      val n = in.read(magic)
      if (n < 4) Csv
      else if (magic(0) == 'P' && magic(1) == 'K') Xlsx
      else if (new String(magic, "ASCII") == "FEA1") Feather
      else if (new String(magic, "ASCII") == "PAR1") Parquet
      else Csv
    } finally in.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = sniff(path) match {
    case Parquet => spark.read.parquet(path)
    case Csv     => readCsv(spark, path, CsvOptions())
    case Feather => throw new UnsupportedOperationException(
      "Feather v1 is not a Spark-native format; convert to Parquet (the engine's columnar fast path)")
    case Xlsx    => throw new UnsupportedOperationException(
      "XLSX is out of core scope (optional in the reference too); convert to CSV/Parquet")
  }

  /** Reference CSV knobs (reference: native_libs/src/IO/csv.h:62-80):
    * header policy (take from first row / generate colN / custom names). */
  final case class CsvOptions(
      header: HeaderPolicy = HeaderFromFirstRow,
      separator: String = ",")
  sealed trait HeaderPolicy
  case object HeaderFromFirstRow extends HeaderPolicy
  case object GenerateColumnNames extends HeaderPolicy
  final case class CustomNames(names: Seq[String]) extends HeaderPolicy

  def readCsv(spark: SparkSession, path: String, opts: CsvOptions): DataFrame = {
    val base = spark.read
      .option("sep", opts.separator)
      .option("inferSchema", true)        // reference infers over first 50 rows; Spark over the file
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("nullValue", "")
    opts.header match {
      case HeaderFromFirstRow => base.option("header", true).csv(path)
      case GenerateColumnNames =>
        val df = base.option("header", false).csv(path)
        df.toDF(df.columns.indices.map(i => s"col$i"): _*)
      case CustomNames(names) =>
        base.option("header", false).csv(path).toDF(names: _*)
    }
  }

  /** Write dispatching on extension (csv/txt -> CSV, parquet/feather role ->
    * Parquet) — reference: IO/IO.cpp:92-99. */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv") || lower.endsWith(".txt"))
      df.write.mode("overwrite").option("header", header).csv(path)
    else
      df.write.mode("overwrite").parquet(path)
  }
}
