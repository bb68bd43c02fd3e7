package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: step-level timing inside multi-job queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      org.apache.spark.sql.graftx.Bridge.unloadStreamState()
      spark.catalog.listTables().collect()
        .withFilter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
    }
    val qs = Seq("q_stream_tumbling", "q_stream_session", "q_stream_lsh",
      "q_stream_sliding", "q_stream_moments", "q_stream_dedup")
    def hashOf(name: String): Long = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    }
    // warm
    graft.SparkEntry.queries("q_stream_tumbling")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    sweep()
    for (r <- 1 to 2) {
      for (q <- qs) {
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        val hA = time(s"run$r $q noData=true")(hashOf(q)); sweep()
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        val hB = time(s"run$r $q noData=false")(hashOf(q)); sweep()
        println(s"[probe] run$r $q hashes ${if (hA == hB) "MATCH" else s"DIFFER $hA $hB"}")
      }
    }
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.stop()
  }
}
