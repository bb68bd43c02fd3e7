package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming surface: windowed aggs with watermark, running
  * state, streaming dedup — driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window aggregation with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = StreamOps.tumblingAgg(
      input.toDF.toDF("ts", "user_id", "value"), "ts", "user_id", "value",
      "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), 1L, 2.0),
        (ts("2024-01-01 00:04:00"), 1L, 3.0),
        (ts("2024-01-01 00:11:00"), 1L, 10.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, sum, count FROM tumbling ORDER BY window.start")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getDouble(1) == 5.0 && rows(0).getLong(2) == 2L)
      assert(rows(1).getDouble(1) == 10.0)
    } finally q.stop()
  }

  test("sliding window aggregation: overlapping windows each count the event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = StreamOps.slidingAgg(
      input.toDF.toDF("ts", "user_id", "value"), "ts", "user_id", "value",
      "10 minutes", "5 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    try {
      input.addData((ts("2024-01-01 00:07:00"), 1L, 3.0))
      q.processAllAvailable()
      // event at :07 falls in windows [00:00,00:10) and [00:05,00:15)
      val rows = spark.sql("SELECT window.start, sum FROM sliding ORDER BY window.start")
        .collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getDouble(1) == 3.0))
    } finally q.stop()
  }

  test("session window aggregation merges events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = StreamOps.sessionAgg(
      input.toDF.toDF("ts", "user_id", "value"), "ts", "user_id", "value",
      "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:03:00"), 1L, 2.0),  // within gap -> same session
        (ts("2024-01-01 00:20:00"), 1L, 4.0))  // new session
      q.processAllAvailable()
      val rows = spark.sql("SELECT sum, count FROM sessions ORDER BY session_window.start")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getDouble(0) == 3.0 && rows(0).getLong(1) == 2L)
      assert(rows(1).getDouble(0) == 4.0)
    } finally q.stop()
  }

  test("mapGroupsWithState running stats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val out = StreamOps.runningStats(input.toDS())
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      input.addData(StreamOps.Event(1L, 2.0), StreamOps.Event(1L, 4.0))
      q.processAllAvailable()
      input.addData(StreamOps.Event(1L, 6.0)) // second batch accumulates state
      q.processAllAvailable()
      val last = spark.sql("SELECT n, sum, mean FROM running WHERE user_id = 1 ORDER BY n DESC")
        .collect()(0)
      assert(last.getLong(0) == 3L)
      assert(last.getDouble(1) == 12.0)
      assert(last.getDouble(2) == 4.0)
    } finally q.stop()
  }

  test("streaming heavy hitters: every true >n/k item survives across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamOps.streamingHeavyHitters(input.toDS(), k = 4, shards = 2)
    val q = out.writeStream.format("memory").queryName("shh")
      .outputMode("update").start()
    try {
      // batch 1: "hot" dominates; batch 2 keeps it hot amid churn
      input.addData(Seq.fill(30)("hot") ++ (1 to 10).map(i => s"a$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(20)("hot") ++ (1 to 10).map(i => s"b$i"): _*)
      q.processAllAvailable()
      // n = 70, k = 4 -> guarantee: freq > 17.5 must be present; hot = 50
      val finalCands = spark.sql(
        """SELECT items FROM (
          |  SELECT shard, items,
          |    row_number() OVER (PARTITION BY shard ORDER BY mono DESC) rn
          |  FROM (SELECT shard, items, monotonically_increasing_id() mono FROM shh))
          |WHERE rn = 1""".stripMargin)
        .collect().flatMap(_.getSeq[String](0)).toSet
      assert(finalCands.contains("hot"))
      assert(finalCands.size <= 2 * 3) // <= shards * (k-1) bounded state
    } finally q.stop()
  }

  test("streaming CMS: the maintained counter matrix equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val items = (0L until 300L).map(i => i % 37)
    val input = MemoryStream[Long]
    val out = StreamOps.streamingCms(input.toDF.toDF("k"), col("k"), 3, 32)
    val q = out.writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    try {
      // arbitrary batch splits: additive counters are merge-order-
      // invariant, so the final state must not care
      for (slice <- Seq(items.slice(200, 300), items.slice(0, 120),
          items.slice(120, 200))) {
        input.addData(slice: _*); q.processAllAvailable()
      }
      val streamed = spark.table("scms").orderBy("r", "bucket").collect().toSeq
      val batch = graft.operators.Sketch.cmsSketch(
          items.toDF("k"), col("k"), 3, 32)
        .orderBy("r", "bucket").collect().toSeq
      assert(streamed === batch,
        "streamed counter matrix must equal the batch sketch bit for bit")
      assert(streamed.length <= 3 * 32, "state bounded at d*w rows")
    } finally q.stop()
  }

  test("streaming priority sample: final shard states reconstruct the batch DLT sample across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 300L).map(i => (i, (i % 41 + 1).toDouble))
    val k = 16
    val input = MemoryStream[(Long, Double)]
    val out = StreamOps.streamingPrioritySample(
      input.toDF.toDF("id", "w"), "id", "w", k = k, shards = 4)
    val q = out.writeStream.format("memory").queryName("sps")
      .outputMode("update").start()
    try {
      // three arbitrary batch splits — the running top-(k+1) per shard is
      // merge-order-invariant, so the final states must not care. Assert
      // the state bound per batch: every emission (= the shard's full
      // current state) adds <= k+1 rows per shard to the update sink.
      def perShardCounts() = spark.table("sps").groupBy("shard").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var prev = Map.empty[Int, Long]
      // the 4th slice RE-DELIVERS every row (at-least-once semantics):
      // a re-delivered id must not occupy two of a shard's k+1 slots —
      // state merges dedup by id before truncating, so the final states
      // (and τ/est_w below) are identical to exactly-once delivery
      for (slice <- Seq(rows.slice(100, 300), rows.slice(0, 50), rows.slice(50, 100),
          rows)) {
        input.addData(slice: _*)
        q.processAllAvailable()
        val now = perShardCounts()
        assert(now.forall { case (s, c) => c - prev.getOrElse(s, 0L) <= k + 1 },
          s"a shard emitted more than its k+1-entry state: prev=$prev now=$now")
        prev = now
      }
      // union of emissions, dedup'd by entry: an id's (w, q) never changes,
      // and an entry EVICTED from a shard's top-(k+1) has k+1 better rows
      // in its own shard — so stale rows can never reach the global
      // top-(k+1) and the dedup'd union merges exactly like final states
      val latest = spark.table("sps").select("shard", "id", "w", "q").distinct()
      // finish: global rank over shard lists == batch prioritySample
      val win = org.apache.spark.sql.expressions.Window
        .orderBy(col("q").desc, col("id"))
      val ranked = latest.withColumn("rk", row_number().over(win))
        .filter(col("rk") <= k + 1)
      val tauV = ranked.filter(col("rk") === k + 1)
        .select("q").collect().headOption.map(_.getDouble(0))
      val got = ranked.filter(col("rk") <= k)
        .withColumn("est_w", greatest(col("w"), lit(tauV.getOrElse(0.0))))
        .select("id", "w", "est_w").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      val want = graft.operators.Sampling.prioritySample(
          rows.toDF("id", "w"), "id", col("w"), k)
        .select("id", "w", "est_w").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(got == want,
        "streamed shard-merged sample must equal the batch DLT sample exactly")
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.streamingDedup(
      input.toDF.toDF("ts", "key"), "ts", Seq("key"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), 7L), (ts("2024-01-01 00:01:00"), 7L),
        (ts("2024-01-01 00:02:00"), 8L))
      q.processAllAvailable()
      val keys = spark.sql("SELECT key FROM dedup").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == Seq(7L, 8L))
    } finally q.stop()
  }

  test("stream-stream interval join: matches within the bound, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val joined = StreamOps.streamStreamIntervalJoin(
      clicks.toDF.toDF("click_ts", "user_id", "click_id"),
      buys.toDF.toDF("buy_ts", "user_id", "amount"),
      Seq("user_id"), "click_ts", "buy_ts",
      lateness = "10 minutes", rangeAfter = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 00:00:00"), 1L, 100L),
        (ts("2024-01-01 00:00:00"), 2L, 200L))
      q.processAllAvailable()
      // purchase arrives in a LATER micro-batch; u1 at +10min matches,
      // u2 at +40min is outside the bound, u1 at -5min precedes the click
      buys.addData((ts("2024-01-01 00:10:00"), 1L, 5.0),
        (ts("2024-01-01 00:40:00"), 2L, 7.0),
        (ts("2023-12-31 23:55:00"), 1L, 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, click_id, amount FROM ssjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 100L, 5.0)))
    } finally q.stop()
  }

  test("streaming LSH claims: buckets equal the batch pipeline, owners persist across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),     // exact dup of 10
      (12L, "one two three four five six seven"),
      (13L, "totally different words in this line"),
      (14L, "xy"))                                      // < 3 tokens: no shingles
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingLshClaims(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("lshclaims")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(3): _*) // 10, 11, 12 in batch 1
      q.processAllAvailable()
      input.addData((10L, corpus.head._2), corpus(3), corpus(4)) // re-arrival + new
      q.processAllAvailable()
      val claims = spark.table("lshclaims")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      // bucket keys must equal the batch banding of batch signatures
      val batchBuckets = graft.operators.Dedup.minhashBandBuckets(
        graft.operators.Dedup.minhashSignatures(
          corpus.toDF("doc_id", "text"), "text", "doc_id", 16, 3,
          family = graft.operators.Dedup.MinhashFamily.polynomial),
        "doc_id", 16, 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(claims.map(c => (c._1, c._2, c._3)).toSet == batchBuckets)
      // doc 14 never claims (no shingles); dup doc 11 is flagged in all 4
      // bands (owner 10); doc 10's re-arrival still owns its buckets
      assert(!claims.exists(_._1 == 14L))
      assert(claims.filter(_._1 == 11L).forall(_._4 == 10L))
      val rearrival = claims.filter(c => c._1 == 10L)
      assert(rearrival.size == 8 && rearrival.forall(_._4 == 10L)) // 4 bands x 2 arrivals
      // unique docs own all their buckets
      assert(claims.filter(_._1 == 13L).forall(_._4 == 13L))
    } finally q.stop()
  }

  test("streaming LSH verify: confirmed pairs equal the owner-anchored batch-verified set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),         // exact dup of 10
      (12L, "alpha beta gamma delta epsilon zeta eta theta extra"),   // near dup of 10
      (13L, "one two three four five six seven eight"),
      (14L, "totally different words in this line here now"),
      (15L, "xy"))                                                    // no shingles
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingLshVerified(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("lshverify")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      q.processAllAvailable()
      val got = spark.table("lshverify")
        .select("id_a", "id_b", "est_jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      // independent replay from the BATCH primitives: owner-anchored
      // claims (owner = bucket min) filtered by the same est-Jaccard
      val sigs = graft.operators.Dedup.minhashSignatures(
        corpus.toDF("doc_id", "text"), "text", "doc_id", 16, 3,
        family = graft.operators.Dedup.MinhashFamily.polynomial)
      val sigMap = sigs.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val buckets = graft.operators.Dedup.minhashBandBuckets(sigs, "doc_id", 16, 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val owners = buckets.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.map(_._1).min }
      val expect = buckets.flatMap { case (id, band, bucket) =>
        val owner = owners((band, bucket))
        if (owner == id) None
        else {
          val est = sigMap(id).zip(sigMap(owner)).count { case (a, b) => a == b } / 16.0
          if (est >= 0.5) Some((owner, id, est)) else None
        }
      }.toSet
      assert(got == expect, s"got $got expect $expect")
      assert(got.contains((10L, 11L, 1.0)), "exact dup must confirm at est 1.0")
      assert(got.exists(p => p._1 == 10L && p._2 == 12L), "near dup must confirm")
      assert(!got.exists(p => p._1 == 15L || p._2 == 15L))
      // every streaming-confirmed pair is a batch-verified pair (same
      // estimator, same threshold): the in-stream verify closes the loop
      // the batch miner closes offline
      val batchPairs = graft.operators.Dedup.minhashNearDups(
        corpus.toDF("doc_id", "text"), "text", "doc_id", 0.5,
        family = graft.operators.Dedup.MinhashFamily.polynomial)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.subsetOf(batchPairs),
        s"streaming pairs not verified by batch: ${got -- batchPairs}")
    } finally q.stop()
  }

  /** Deadline-poll for TTL'd streams: under ProcessingTimeTimeout Spark
    * schedules a batch on EVERY trigger (`shouldRunAnotherBatch` is
    * unconditionally true — timeout processing must run), so `noNewData`
    * is never set and `processAllAvailable()` NEVER returns (livelock,
    * not slowness). Poll the observable instead, and fail fast on a
    * deadline so the suite terminates either way. */
  private def pollUntil(what: String, deadlineMs: Long = 90000L)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < end) { Thread.sleep(50); ok = cond }
    assert(ok, s"deadline ${deadlineMs} ms expired waiting for: $what")
  }

  private def stateRowsTotal(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L else p.stateOperators.map(_.numRowsTotal).sum
  }

  test("streaming LSH verify on the RocksDB state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamOps.useRocksDBStateStore(spark)
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingLshVerified(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", threshold = 0.5,
      stateTtl = Some("1 hour"))
    // TTL arms ProcessingTimeTimeout: explicit trigger (no hot-spin) and
    // deadline-polling (processAllAvailable can never return) — see pollUntil
    val q = out.writeStream.format("memory").queryName("lshrocks")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData((10L, "alpha beta gamma delta epsilon zeta"))
      // wait until doc 10's batch COMMITTED, so doc 20 lands in a later one
      pollUntil("batch 1 (doc 10) committed")(q.recentProgress.exists(_.numInputRows > 0))
      input.addData((20L, "alpha beta gamma delta epsilon zeta")) // later batch
      pollUntil("verified pair in sink")(spark.table("lshrocks").limit(1).count() > 0)
      // owner's signature survived in RocksDB state across batches
      val rows = spark.table("lshrocks")
        .select("id_a", "id_b", "est_jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((10L, 20L, 1.0)))
      // and the state operator really ran on RocksDB
      import scala.jdk.CollectionConverters._
      val metrics = q.lastProgress.stateOperators.flatMap(_.customMetrics.keySet().asScala)
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"state operator not RocksDB-backed: ${metrics.mkString(", ")}")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateTtl evicts idle buckets: re-arrival after the horizon is a fresh first sighting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "alpha beta gamma delta epsilon zeta"
    val input = MemoryStream[(Long, String)]
    // claims (not verified) so a FRESH first sighting has a positive
    // observable: every doc emits owner rows, and post-eviction re-arrival
    // must own its own buckets
    val out = StreamOps.streamingLshClaims(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id",
      stateTtl = Some("500 milliseconds"))
    val q = out.writeStream.format("memory").queryName("lshttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      input.addData((10L, textA)) // batch 1: doc 10 owns its buckets
      pollUntil("doc 10 claims in sink")(
        spark.table("lshttl").filter($"doc_id" === 10L).limit(1).count() > 0)
      // idle past the TTL: the empty batches the ProcessingTime trigger
      // keeps scheduling run the timeout callbacks and EVICT the buckets
      pollUntil("idle buckets evicted (state rows -> 0)")(stateRowsTotal(q) == 0L)
      // the same text re-arrives — with the owner evicted it is a fresh
      // first sighting that OWNS its buckets, not a near-dup of doc 10
      input.addData((20L, textA))
      pollUntil("doc 20 claims in sink")(
        spark.table("lshttl").filter($"doc_id" === 20L).limit(1).count() > 0)
      val owners20 = spark.table("lshttl").filter($"doc_id" === 20L)
        .select("owner").distinct().collect().map(_.getLong(0)).toSeq
      assert(owners20 == Seq(20L),
        s"evicted owner still matched: owners=${owners20.mkString(", ")}")
    } finally q.stop()
  }

  test("LSH registry survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // failure-recovery semantics at scale: a restarted query must resume
    // the bucket registry (owner + signature) from the checkpoint, not
    // re-learn the corpus — otherwise every executor loss resets dedup
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // memory sink can't recover from a checkpoint — use the file sink,
    // the production shape anyway (exactly-once via _spark_metadata)
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val text = "alpha beta gamma delta epsilon zeta"
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingLshVerified(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", threshold = 0.5)
    def start() = out.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData((10L, text)) // doc 10 owns its buckets, state checkpointed
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // RESTART from the same checkpoint
    try {
      input.addData((20L, text)) // dup arrives after the restart
      q2.processAllAvailable()
      val pairs = spark.read.parquet(outDir)
        .select("id_a", "id_b", "est_jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.contains((10L, 20L, 1.0)),
        s"restarted query lost the registry: ${pairs.mkString(", ")}")
    } finally q2.stop()
  }

  test("bucket ownership: a later batch with a smaller doc_id cannot steal the bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta"
    // no TTL -> NoTimeout -> processAllAvailable terminates normally
    val input = MemoryStream[(Long, String)]
    val out = StreamOps.streamingLshVerified(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("lshsteal")
      .outputMode("append").start()
    try {
      input.addData((20L, text)) // batch 1: doc 20 is the first sighting
      q.processAllAvailable()
      input.addData((10L, text)) // batch 2: SMALLER id arrives later
      q.processAllAvailable()
      // first sighting stays owner; the late smaller id is verified
      // against it (pre-fix: owner flipped to 10 and NO pair was emitted)
      val pairs = spark.table("lshsteal")
        .select("id_a", "id_b", "est_jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSeq == Seq((20L, 10L, 1.0)), s"got ${pairs.mkString(", ")}")
    } finally q.stop()

    // same contract on the claims stream: doc 10's late claims carry the
    // standing owner 20
    val input2 = MemoryStream[(Long, String)]
    val claims = StreamOps.streamingLshClaims(
      input2.toDF.toDF("doc_id", "text"), "text", "doc_id")
    val q2 = claims.writeStream.format("memory").queryName("lshsteal2")
      .outputMode("append").start()
    try {
      input2.addData((20L, text))
      q2.processAllAvailable()
      input2.addData((10L, text))
      q2.processAllAvailable()
      val owners10 = spark.table("lshsteal2").filter($"doc_id" === 10L)
        .select("owner").distinct().collect().map(_.getLong(0)).toSeq
      assert(owners10 == Seq(20L), s"late smaller id stole the bucket: $owners10")
    } finally q2.stop()
  }

  test("append stream self-compacts its small-file backlog (autoMaintain wiring)") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // an ingest table only a stream appends to: one small file lands
    // per micro-batch forever — the accretion maintenanceReport flags —
    // and nobody runs a nightly job against it. maintainEvery=4 makes
    // the sink itself compact every 4th successful batch.
    val base = java.nio.file.Files.createTempDirectory("graft_asm").toString
    val path = base + "/t"
    VersionedTable.create(spark.range(10).toDF("id"), path)
    val input = MemoryStream[Long]
    val q = input.toDF.toDF("id").writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        VersionedTable.commitStreamBatch(b, path, "ap", bid,
          maintainEvery = 4)
        (): Unit
      }
      .option("checkpointLocation", base + "/ck")
      .start()
    try {
      for (i <- 0 until 8) {
        input.addData(100L + i)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the stream compacted ITSELF mid-run (batch 3 and batch 7 hooks)
    val hist = VersionedTable.history(spark, path).collect()
    assert(hist.count(_.getString(1) == "optimize") >= 2,
      s"no self-compaction in history: ${hist.map(_.getString(1)).mkString(",")}")
    // backlog bounded: at most the 1 compacted file + the batches since
    val vLast = VersionedTable.latestVersion(path).get
    assert(VersionedTable.filesAt(path, vLast).size <= 4,
      s"small-file backlog unbounded: ${VersionedTable.filesAt(path, vLast).size}")
    // content exactly once, compaction included
    assert(VersionedTable.read(spark, path).select("id").as[Long]
      .collect().sorted.toSeq === ((0L until 10L) ++ (100L until 108L)))
    // the replay guard walks straight past the maintenance commits'
    // own actions: an old batchId is still a no-op, a new one commits
    assert(VersionedTable.commitStreamBatch(
      spark.range(500, 501).toDF("id"), path, "ap", 5L).isEmpty)
    assert(VersionedTable.commitStreamBatch(
      spark.range(108, 109).toDF("id"), path, "ap", 8L).nonEmpty)
    assert(VersionedTable.read(spark, path).count() === 19L)
  }

  test("upsert stream self-coalesces its trickle DV backlog (autoMaintain wiring)") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a keyed mirror only a stream ever writes: nobody runs a nightly
    // job against it, so the sink itself must apply the maintenance
    // policy. One ~1.5MB base file keeps compact/purge quiet
    // (maintainTargetBytes=256 -> no file is "small"; DV bytes stay
    // well under 1% of data), so the SHARD-COUNT trigger is what fires.
    val base = java.nio.file.Files.createTempDirectory("graft_sm").toString
    val path = base + "/t"
    VersionedTable.create(
      spark.range(200000).select($"id", ($"id" * 10).as("x")).coalesce(1), path)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF.toDF("id", "x").writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        VersionedTable.upsertStreamBatch(b, path, Seq("id"), "sm", bid,
          maintainEvery = 3, maxDvShards = 4, maintainTargetBytes = 256L)
        (): Unit
      }
      .option("checkpointLocation", base + "/ck")
      .start()
    try {
      // six trickle batches, each marking a few base rows via DV —
      // the shard-per-batch accretion maintenanceReport flags
      for (i <- 0 until 6) {
        input.addData((i.toLong, -i.toLong), (1000L + i, 1L), (i + 7L, 77L))
        q.processAllAvailable()
      }
    } finally q.stop()
    // the stream crossed the shard threshold MID-RUN and coalesced
    // itself — no operator, no nightly job
    val hist = VersionedTable.history(spark, path).collect()
    assert(hist.exists(_.getString(1) == "coalesce-dv"),
      s"no self-coalesce in history: ${hist.map(_.getString(1)).mkString(",")}")
    val vLast = VersionedTable.latestVersion(path).get
    assert(VersionedTable.dvsAt(path, vLast).size <= 4,
      "backlog not bounded by the in-stream policy")
    // keyed state is exactly the six batches applied over the base
    val got = VersionedTable.read(spark, path)
      .filter($"id".isin(3L, 9L, 1003L, 50000L))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> -3L, 9L -> 77L, 1003L -> 1L, 50000L -> 500000L))
    assert(VersionedTable.read(spark, path).count() === 200000L)
    // exactly-once replay protection walks straight past the
    // maintenance commits' own actions
    assert(VersionedTable.upsertStreamBatch(
      Seq((0L, 9L)).toDF("id", "x"), path, Seq("id"), "sm", 2L) === None)
  }

  test("one-shot replay helpers refuse flush-finalized operators (no-data-batch fence)") {
    // The replay helpers pin noDataMicroBatches=false — safe ONLY for
    // operators that emit within the data batch. Each class that emits in
    // the suppressed flush batch must fail LOUDLY at plan time, not lose
    // rows silently: append-mode windowed aggregation (final windows emit
    // on watermark advance), an armed (flat)mapGroupsWithState timeout,
    // and a non-inner stream-stream join.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fence").toString
    Seq((ts("2024-01-01 00:01:00"), 1L, 2.0))
      .toDF("ts", "user_id", "value").write.parquet(s"$tmp/ev.parquet")
    val appendAgg = intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.runAvailableNow(spark, s"$tmp/ev.parquet",
        "fence_agg", "append") { st =>
        StreamOps.tumblingAgg(st, "ts", "user_id", "value",
          "10 minutes", "5 minutes")
      }
    }
    assert(appendAgg.getMessage.contains("append-mode aggregation"))
    val ttl = intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.runAvailableNow(spark, s"$tmp/ev.parquet",
        "fence_ttl", "append") { st =>
        StreamOps.streamingLshClaims(
          st.select(col("user_id").as("doc_id"),
            lit("aa bb cc dd ee").as("text")),
          "text", "doc_id", stateTtl = Some("30 seconds")).toDF
      }
    }
    assert(ttl.getMessage.contains("armed timeout"))
    val outer = intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.runAvailableNow2(spark, s"$tmp/ev.parquet",
        "fence_outer", "append") { (l, r) =>
        val lw = l.withWatermark("ts", "5 minutes")
        val rw = r.withWatermark("ts", "5 minutes")
          .withColumnRenamed("ts", "ts2").withColumnRenamed("value", "v2")
        lw.join(rw, lw("user_id") === rw("user_id") &&
          col("ts2").between(col("ts") - expr("interval 10 minutes"),
            col("ts") + expr("interval 10 minutes")), "left_outer")
      }
    }
    assert(outer.getMessage.contains("non-inner stream-stream join"))
    // the same complete-mode aggregation still passes the fence (it
    // re-emits full state in the data batch)
    val ok = graft.queries.PipelineQueries.runAvailableNow(spark,
      s"$tmp/ev.parquet", "fence_ok", "complete") { st =>
      StreamOps.tumblingAgg(st, "ts", "user_id", "value",
        "10 minutes", "5 minutes")
    }
    assert(ok.count() === 1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
