package graft.tools

import org.apache.spark.sql.SparkSession

/** Fleet-wide plan audit: build every SparkEntry query and report its
  * physical-plan shape — shuffle Exchange count, BroadcastExchange
  * count, WholeStageCodegen span count — plus a distribution summary.
  * The per-query shuffle-ceiling spec (PlanShapeSpec) pins the NAMED
  * hot paths; this tool is the whole-surface census behind the PLANS.md
  * evidence tables.
  *
  * Note: streaming queries execute through their harness and return the
  * memory-sink table, so their reported plan is the sink read (0
  * exchanges) — their stateful shapes are audited in StreamingSpec /
  * PLANS.md instead. Roundtrip queries execute their writes as a side
  * effect of query construction; run against sf0.001 to keep that cheap.
  *
  * Usage: runMain graft.tools.PlanReport [sfDir]
  */
object PlanReport {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.queries.BucketedTables.ensure(spark, dir)
    catch { case e: Throwable => System.err.println(s"[plan] bucket staging failed: $e") }

    val exRe = raw"\(\d+\) Exchange\b".r
    val bexRe = raw"\(\d+\) BroadcastExchange\b".r
    // (no codegen-span column: under AQE the pre-execution formatted plan
    // carries no codegen-stage annotations — span audits live in the
    // executed-plan specs instead)
    var results = Vector.empty[(String, Int, Int)]
    var errors = Vector.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val t = (name, exRe.findAllIn(plan).size, bexRe.findAllIn(plan).size)
        results :+= t
        println(f"[plan] ${t._1}%-24s exchanges=${t._2}%2d broadcast=${t._3}%2d")
      } catch { case e: Throwable =>
        errors :+= name
        println(s"[plan] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      // side-effecting queries (streams, roundtrips) leave caches/views
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      org.apache.spark.sql.graftx.Bridge.unloadStreamState()
      spark.catalog.listTables().collect()
        .withFilter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
    }
    val dist = results.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k->${v.size}" }.mkString(" ")
    println(s"[plan] === ${results.size} queries, errors=${errors.size} ${errors.mkString(",")}")
    println(s"[plan] === exchange-count distribution: $dist")
    val worst = results.sortBy(-_._2).take(8)
      .map(t => s"${t._1}=${t._2}").mkString(", ")
    println(s"[plan] === most exchanges: $worst")
    spark.stop()
  }
}
