package graft.tools

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling harness: time sub-plans of a query in isolation.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val idx = docs.select(col("doc_id"), col("source").as("block"),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 4))).as("shingle"))

    time("shingle index")(idx.count())
    time("shingle index again")(idx.count())
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    time("sizes")(sizes.count())
    val a = idx.select(col("doc_id").as("id_a"), col("block"), col("shingle"))
    val b = idx.select(col("doc_id").as("id_b"), col("block"), col("shingle"))
    val joined = a.join(b, Seq("block", "shingle")).filter(col("id_a") < col("id_b"))
    time("pair join")(joined.count())
    val inter = joined.groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("inter")(inter.count())
    time("full ngramJaccard")(
      Dedup.ngramJaccard(docs, "text", "doc_id", "source", 4).count())
    spark.stop()
  }
}
