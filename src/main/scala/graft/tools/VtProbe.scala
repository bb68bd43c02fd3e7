package graft.tools

import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: phase-level timing inside the VersionedTable faces
  * (q_table_stream_upsert, deleteWhere ops) — where do the seconds go? */
object VtProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job wall times with call-site, to see where a phase's seconds go
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) println(f"[vtjob]   job ${je.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[vt] $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    docs0.count() // warm

    for (round <- 1 to 3) {
      println(s"[vt] ---- upsert-stream round $round ----")
      val docs = docs0
      val base = java.nio.file.Files.createTempDirectory("vtprobe").toString
      val a = base + "/a"; val b = base + "/b"
      time("create A (corpus, 4 parts)")(
        VersionedTable.create(docs.repartition(4), a))
      time("create B (empty)")(VersionedTable.create(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))), b))
      val q = time("stream start") {
        spark.readStream
          .format("org.apache.spark.sql.graftx.VersionedTableStreamProvider")
          .option("path", a).load()
          .writeStream
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            VersionedTable.upsertStreamBatch(
              batch.select(col("doc_id"), col("lang"), col("text")),
              b, Seq("doc_id"), "cdc", bid)
            (): Unit
          }
          .option("checkpointLocation", base + "/ck")
          .start()
      }
      try {
        time("batch 0 (snapshot insert)")(q.processAllAvailable())
        val churn = docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("lang"),
            concat(col("text"), lit(" v2")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 3000000000000L).as("doc_id"),
              col("lang"), col("text")))
        time("commit churn to A")(
          VersionedTable.commit(churn.repartition(2), a, "append"))
        time("batch 1 (merge)")(q.processAllAvailable())
      } finally time("stream stop")(q.stop())
      time("read B + fingerprint agg") {
        VersionedTable.read(spark, b)
          .select(col("lang"), col("doc_id"),
            graft.operators.TextOps.fingerprint(concat(col("doc_id").cast("string"),
              lit(":"), col("text"))).as("fp"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
            sum(col("fp")).as("content_sum"))
          .orderBy(col("lang"))
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))

      println(s"[vt] ---- deleteWhere round $round ----")
      val dbase = java.nio.file.Files.createTempDirectory("vtprobe_d").toString
      val dpath = dbase + "/docs"
      time("create (corpus, 4 parts)")(
        VersionedTable.create(docs.repartition(4), dpath))
      time("deleteWhere #1 (n_chars-free pred)")(
        VersionedTable.deleteWhere(spark, dpath, col("lang") === "de"))
      time("deleteWhere #2 (second DV commit)")(
        VersionedTable.deleteWhere(spark, dpath, col("doc_id") % 7 === 3))
      time("read post-DV + agg") {
        VersionedTable.read(spark, dpath)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"))
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dbase))
    }
    spark.stop()
  }
}
