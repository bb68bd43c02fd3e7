package graft.tools

import graft.sources.{FeatherV1, TableIO}
import org.apache.spark.sql.SparkSession

/** Feather v1 <-> Parquet converter: the ingest/export bridge between the
  * reference toolchain's single-file format and the engine's scale format.
  * `runMain graft.tools.FeatherConvert <in> <out>` — direction decided by
  * the output extension (.feather writes v1, anything else Parquet). */
object FeatherConvert {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FeatherConvert <in> <out>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = TableIO.read(spark, args(0))
    if (args(1).toLowerCase.endsWith(".feather")) FeatherV1.write(df, args(1))
    else df.write.mode("overwrite").parquet(args(1))
    println(s"[feather-convert] ${args(0)} -> ${args(1)} (${df.count()} rows)")
    spark.stop()
  }
}
