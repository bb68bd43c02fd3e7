package graft

import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: row-level deletes that rewrite ZERO
  * data bytes. A delete commit publishes the SAME data files plus an
  * O(deleted)-row DV sidecar; readers anti-join it; optimize/compact
  * purge it physically. The spec proves the headline property the hard
  * way — file bytes and names are asserted untouched across deletes. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    java.nio.file.Files.createTempDirectory("graft_dv").toString + "/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def dataFiles(path: String): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(path, "data")
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> java.nio.file.Files.size(p)).toMap
    } finally s.close()
  }

  test("deleteWhere rewrites zero data bytes and accumulates across commits") {
    val path = fresh()
    VersionedTable.create(
      spark.range(100).select($"id", ($"id" % 7).as("m")).repartition(4), path)
    val before = dataFiles(path)

    val v1 = VersionedTable.deleteWhere(spark, path, col("m") === 3)
    assert(v1 === 1L)
    // the delete touched no data file: same names, same bytes
    assert(dataFiles(path) === before)
    assert(VersionedTable.hasDeletes(path, v1))
    assert(ids(VersionedTable.read(spark, path)) ===
      (0L until 100L).filterNot(_ % 7 == 3))
    // time travel: v0 still sees every row
    assert(ids(VersionedTable.readVersion(spark, path, 0)) === (0L until 100L))

    // second delete accumulates; already-deleted rows don't re-mark
    val v2 = VersionedTable.deleteWhere(spark, path, col("id") < 10)
    assert(dataFiles(path) === before)
    assert(ids(VersionedTable.readVersion(spark, path, v2)) ===
      (10L until 100L).filterNot(_ % 7 == 3))
    // v1 unchanged by v2's delete
    assert(ids(VersionedTable.readVersion(spark, path, v1)) ===
      (0L until 100L).filterNot(_ % 7 == 3))
  }

  test("a no-op delete publishes nothing (streams stay alive)") {
    val path = fresh()
    VersionedTable.create(spark.range(10).toDF("id"), path)
    // no matching row: no version published — a 'delete-dv' action with
    // no change would poison append-only streaming consumers
    assert(VersionedTable.deleteWhere(spark, path, col("id") > 999) === 0L)
    assert(VersionedTable.versions(path) === Seq(0L))
    assert(ids(VersionedTable.read(spark, path)) === (0L until 10L))
  }

  test("upsert normalizes source types: int-keyed source on a long-keyed table") {
    val path = fresh()
    VersionedTable.create(
      spark.range(10).select($"id", ($"id" * 10).as("x")), path)
    // Int source columns (Scala literals): must match-and-replace, not
    // silently miss the prefilter and insert duplicates
    val src = Seq((5, 999), (100, 1)).toDF("id", "x") // IntegerType
    VersionedTable.upsert(spark, path, src, Seq("id"))
    val got = VersionedTable.read(spark, path)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === ((0L until 10L).filterNot(_ == 5).map(i => (i, i * 10))
      ++ Seq((5L, 999L), (100L, 1L))).sortBy(_._1))
    // schema stays single-typed across files (no mixed int/long footers)
    assert(VersionedTable.read(spark, path).schema("id").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("overlapping deletes never duplicate (file,pos) marks") {
    val path = fresh()
    VersionedTable.create(spark.range(100).toDF("id").repartition(2), path)
    VersionedTable.deleteWhere(spark, path, col("id") < 50)
    val v2 = VersionedTable.deleteWhere(spark, path, col("id") < 60) // overlap
    val dvRows = spark.read.parquet(VersionedTable.dvsAt(path, v2): _*).count()
    assert(dvRows === 60L, s"expected 60 distinct marks, got $dvRows")
    assert(ids(VersionedTable.readVersion(spark, path, v2)) === (60L until 100L))
  }

  test("changeFeed sees DV deletes on clone-borrowed files; partitioned clone refuses") {
    val src = fresh()
    VersionedTable.create(spark.range(20).toDF("id").repartition(2), src)
    val dst = fresh()
    VersionedTable.cloneTable(src, dst)
    val v1 = VersionedTable.deleteWhere(spark, dst, col("id") < 3)
    val feed = VersionedTable.changeFeed(spark, dst, 0L, v1, Seq("id"), Seq())
      .select($"id", $"change").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(feed === (0L until 3L).map(i => (i, "removed")))
    // hive-partitioned source: clone must fail fast, not drop the column
    val psrc = fresh()
    VersionedTable.createPartitioned(
      spark.range(10).select($"id", ($"id" % 2).cast("string").as("p")),
      psrc, "p")
    val e = intercept[IllegalArgumentException](
      VersionedTable.cloneTable(psrc, fresh()))
    assert(e.getMessage.contains("flat layouts only"))
  }

  test("upsert replaces matched keys via DV and appends the source") {
    val path = fresh()
    VersionedTable.create(
      spark.range(20).select($"id", ($"id" * 10).as("x")).repartition(3), path)
    val before = dataFiles(path)
    val source = Seq((5L, 999L), (7L, 777L), (100L, 1L), (101L, 2L))
      .toDF("id", "x")
    val v1 = VersionedTable.upsert(spark, path, source, Seq("id"))
    // target files untouched; only NEW files appended
    val after = dataFiles(path)
    before.foreach { case (f, sz) => assert(after.get(f) === Some(sz)) }
    assert(after.size > before.size)
    val got = VersionedTable.readVersion(spark, path, v1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = ((0L until 20L).filterNot(i => i == 5 || i == 7)
      .map(i => (i, i * 10)) ++ Seq((5L, 999L), (7L, 777L), (100L, 1L), (101L, 2L)))
      .sortBy(_._1)
    assert(got === want)
    // upsert on top of an existing delete keeps both
    VersionedTable.deleteWhere(spark, path, col("id") === 0L)
    val v3 = VersionedTable.upsert(spark, path,
      Seq((1L, -1L)).toDF("id", "x"), Seq("id"))
    val got3 = VersionedTable.readVersion(spark, path, v3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want3 = (want.filterNot(r => r._1 == 0 || r._1 == 1) :+ (1L, -1L))
      .sortBy(_._1)
    assert(got3 === want3)
  }

  test("subset reads (range / partition / keys / composed) apply DVs") {
    val path = fresh()
    val df = spark.range(200)
      .select($"id", ($"id" % 4).cast("string").as("p"), ($"id" * 3).as("x"))
    VersionedTable.createPartitioned(df, path, "p")
    val v = VersionedTable.deleteWhere(spark, path, col("id") % 10 === 0)
    val live = (0L until 200L).filterNot(_ % 10 == 0)

    // partition-pruned read
    assert(ids(VersionedTable.readWherePartitions(spark, path, v, "p", Seq("1"))) ===
      live.filter(_ % 4 == 1))
    // stats-range read (write stats AFTER delete is allowed: skipping
    // sidecars stay sound under DVs)
    VersionedTable.writeStats(spark, path, v, "id")
    assert(ids(VersionedTable.readWhere(spark, path, v, "id", 0L, 50L)) ===
      live.filter(_ <= 50))
    // bloom keys read: probing a DELETED key returns nothing
    VersionedTable.writeBloom(spark, path, v, "id")
    assert(VersionedTable.readWhereKeys(spark, path, v, "id", Seq("30")).count() === 0L)
    assert(ids(VersionedTable.readWhereKeys(spark, path, v, "id", Seq("31"))) === Seq(31L))
    // composed read
    assert(ids(VersionedTable.readComposed(spark, path, v,
      partitions = Some(("p", Seq("0"))),
      ranges = Seq(("id", 0L, 100L)))) ===
      live.filter(i => i % 4 == 0 && i <= 100))
  }

  test("changeFeed reports DV deletes and upsert updates/inserts") {
    val path = fresh()
    VersionedTable.create(
      spark.range(30).select($"id", ($"id" * 2).as("x")).repartition(2), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") < 5)
    val feed1 = VersionedTable.changeFeed(spark, path, 0L, v1, Seq("id"), Seq("x"))
      .select($"id", $"change").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(feed1 === (0L until 5L).map(i => (i, "removed")))

    val v2 = VersionedTable.upsert(spark, path,
      Seq((10L, -1L), (100L, 5L)).toDF("id", "x"), Seq("id"))
    val feed2 = VersionedTable.changeFeed(spark, path, v1, v2, Seq("id"), Seq("x"))
      .select($"id", $"change").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(feed2 === Seq((10L, "changed"), (100L, "added")))
    // full-span feed composes both commits
    val feedAll = VersionedTable.changeFeed(spark, path, 0L, v2, Seq("id"), Seq("x"))
      .select($"id", $"change").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(feedAll === ((0L until 5L).map(i => (i, "removed")) ++
      Seq((10L, "changed"), (100L, "added"))))
  }

  test("optimize purges DVs physically and re-enables metadata faces") {
    val path = fresh()
    VersionedTable.create(spark.range(50).toDF("id").repartition(4), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 2 === 0)
    // the physical summing face refuses on a DV version rather than
    // overcount; the LIVE face subtracts the exact DV cardinality
    VersionedTable.writeCounts(spark, path, v1) // physical per-file truths
    intercept[IllegalArgumentException](VersionedTable.countAt(path, v1))
    assert(VersionedTable.countAtLive(spark, path, v1) === Some(25L))
    val v2 = VersionedTable.optimize(spark, path, targetBytes = 64L * 1024 * 1024)
    assert(!VersionedTable.hasDeletes(path, v2))
    assert(ids(VersionedTable.readVersion(spark, path, v2)) ===
      (0L until 50L).filter(_ % 2 == 1))
    VersionedTable.writeCounts(spark, path, v2)
    assert(VersionedTable.countAt(path, v2) === Some(25L))
  }

  test("oversized DV backlog degrades to a SHUFFLED anti-join with identical results") {
    val path = fresh()
    VersionedTable.create(spark.range(5000).toDF("id").repartition(4), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 3 === 0)
    val broadcastRead = ids(VersionedTable.readVersion(spark, path, v1))
    // force the big-backlog path: drop the explicit hint AND the
    // planner's own auto-broadcast (a real >threshold backlog clears
    // both), leaving the shuffled anti-join
    spark.conf.set("graft.dv.broadcastBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = VersionedTable.readVersion(spark, path, v1)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("BroadcastHashJoin"),
        s"threshold 0 still broadcasts:\n${plan.take(1200)}")
      assert(ids(df) === broadcastRead)
    } finally {
      spark.conf.unset("graft.dv.broadcastBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("countAtLive excludes dangling DV marks after a partition rewrite") {
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(40).select($"id", ($"id" % 2).cast("string").as("p")),
      path, "p")
    VersionedTable.deleteWhere(spark, path, col("id") < 10) // marks in BOTH partitions
    // replace partition 0 wholesale: its DV marks dangle (files dropped)
    val v2 = VersionedTable.commitPartitioned(
      spark.range(1000, 1005).select($"id", lit("0").as("p")),
      path, "p", "overwritePartitions")
    VersionedTable.writeCounts(spark, path, v2)
    // live = p1 odds minus deleted odds (15) + 5 replacement rows = 20;
    // counting dangling marks would wrongly give 15
    assert(VersionedTable.countAtLive(spark, path, v2) === Some(20L))
    assert(VersionedTable.readVersion(spark, path, v2).count() === 20L)
    // per-partition live counts agree with the actual grouped read
    assert(VersionedTable.partitionRowCountsLive(spark, path, v2, "p")
      === Some(Seq("0" -> 5L, "1" -> 15L)))
  }

  test("metadata-face matrix: exact-or-refusing under DVs, all exact after purge") {
    // The uniform contract, face by face: sidecar WRITES are DV-safe
    // (per-immutable-file physical truth); exact-PHYSICAL reads refuse
    // under outstanding DVs; LIVE reads fold the DV deltas exactly;
    // purge (optimize) re-enables every physical face.
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(60).select($"id", ($"id" % 3).cast("string").as("p")),
      path, "p")
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 4 === 0)
    assert(VersionedTable.hasDeletes(path, v1))
    // writes: all allowed at the DV-carrying version
    VersionedTable.writeCounts(spark, path, v1)
    VersionedTable.writeSums(spark, path, v1, "id")
    VersionedTable.writeMoments(spark, path, v1, "id")
    VersionedTable.writeNdv(spark, path, v1, "id")
    // exact-physical reads: refuse (would overcount deleted rows)
    intercept[IllegalArgumentException](VersionedTable.countAt(path, v1))
    intercept[IllegalArgumentException](
      VersionedTable.partitionRowCounts(path, v1, "p"))
    intercept[IllegalArgumentException](VersionedTable.sumAt(path, v1, "id"))
    intercept[IllegalArgumentException](
      VersionedTable.partitionSums(path, v1, "p", "id"))
    intercept[IllegalArgumentException](
      VersionedTable.partitionMoments(path, v1, "p", "id"))
    intercept[IllegalArgumentException](VersionedTable.ndvAt(path, v1, "id"))
    // live reads: exact against the actual DV-applied read
    val live = VersionedTable.readVersion(spark, path, v1)
    assert(VersionedTable.countAtLive(spark, path, v1) ===
      Some(live.count()))
    assert(VersionedTable.sumAtLive(spark, path, v1, "id") ===
      Some(live.agg(sum($"id")).head().getLong(0)))
    // partition values read back type-inferred (Integer here) —
    // compare on the string form the path segment carries
    val wantByPart = live.groupBy($"p").agg(sum($"id"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1).toSeq
    assert(VersionedTable.partitionSumsLive(spark, path, v1, "p", "id") ===
      Some(wantByPart))
    // moments-live: all four power sums subtract exactly; mean/std on
    // the pinned double path equal the grouped live read's
    val (nLive, ssLive) = VersionedTable.momentsAtLive(spark, path, v1, "id").get
    val liveIds = live.select($"id").as[Long].collect()
    assert(nLive === liveIds.length.toLong)
    assert(ssLive === Seq(
      liveIds.map(BigInt(_)).sum,
      liveIds.map(x => BigInt(x) * x).sum,
      liveIds.map(x => BigInt(x) * x * x).sum,
      liveIds.map(x => BigInt(x) * x * x * x).sum))
    val (meanL, stdL) = VersionedTable.meanStdAtLive(spark, path, v1, "id").get
    val meanWant = liveIds.sum.toDouble / liveIds.length
    assert(meanL === meanWant)
    assert(stdL === math.sqrt(
      liveIds.map(x => BigInt(x) * x).sum.toDouble / liveIds.length -
        meanWant * meanWant))
    // per-partition live moments agree with the grouped live read
    val wantMom = live.groupBy($"p").agg(count(lit(1)), sum($"id"))
      .collect().map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2))))
      .sortBy(_._1).toSeq
    val gotMom = VersionedTable.partitionMomentsLive(spark, path, v1, "p", "id")
      .get.map { case (k, (n, ss)) => k -> ((n, ss(0).toLong)) }
    assert(gotMom === wantMom)
    // skew/kurt live: exact BigInt central sums — assert against the
    // INDEPENDENT mean-centered derivation over the live doubles
    // (numerically clean at this scale), not a re-statement of the
    // implementation's power-sum algebra
    val (g1, g2) = VersionedTable.skewKurtAtLive(spark, path, v1, "id").get
    val xs = liveIds.map(_.toDouble)
    val m1 = xs.sum / xs.length
    def cm(p: Int): Double = xs.map(x => math.pow(x - m1, p)).sum / xs.length
    assert(math.abs(g1 - cm(3) / math.pow(cm(2), 1.5)) < 1e-9)
    assert(math.abs(g2 - (cm(4) / (cm(2) * cm(2)) - 3.0)) < 1e-9)
    // after purge every physical face answers again, and live == exact
    val v2 = VersionedTable.optimize(spark, path, targetBytes = 64L * 1024 * 1024)
    VersionedTable.writeCounts(spark, path, v2)
    VersionedTable.writeSums(spark, path, v2, "id")
    assert(VersionedTable.countAt(path, v2) === Some(live.count()))
    assert(VersionedTable.sumAt(path, v2, "id") ===
      VersionedTable.sumAtLive(spark, path, v2, "id"))
  }

  test("skewKurtAtLive survives large-mean cancellation (exact central sums)") {
    // values ~1.2e9 with O(10) spread: the naive double path computes
    // s2/n − m² at ~1.44e18 magnitude where the double ULP is ~320 —
    // bigger than the real variance (~133), so its mu2 is garbage (it
    // can even come out ≤ 0). The exact BigInt central sums keep full
    // precision until the final double conversions. (Base chosen so
    // Σx⁴ still fits the moments sidecar's Decimal(38,0) carrier.)
    val path = fresh()
    val base = 1200000000L
    VersionedTable.create(
      spark.range(40).select(($"id" + base).as("v"), $"id"), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 5 === 0)
    VersionedTable.writeMoments(spark, path, v1, "v")
    val (g1, g2) = VersionedTable.skewKurtAtLive(spark, path, v1, "v").get
    // independent derivation: skew/kurt are translation-invariant, so
    // the live OFFSETS (x − base, exact small doubles) give the truth
    val xs = VersionedTable.readVersion(spark, path, v1)
      .select(($"v" - base).cast("double")).as[Double].collect()
    val m1 = xs.sum / xs.length
    def cm(p: Int): Double = xs.map(x => math.pow(x - m1, p)).sum / xs.length
    assert(cm(2) > 100) // the variance the double path would destroy
    assert(math.abs(g1 - cm(3) / math.pow(cm(2), 1.5)) < 1e-9)
    assert(math.abs(g2 - (cm(4) / (cm(2) * cm(2)) - 3.0)) < 1e-9)
  }

  test("sumAtLive excludes dangling DV marks after a partition rewrite") {
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(40).select($"id", ($"id" % 2).cast("string").as("p")),
      path, "p")
    VersionedTable.deleteWhere(spark, path, col("id") < 10) // marks in BOTH partitions
    // replace partition 0 wholesale: its DV marks dangle (files dropped)
    val v2 = VersionedTable.commitPartitioned(
      spark.range(1000, 1005).select($"id", lit("0").as("p")),
      path, "p", "overwritePartitions")
    VersionedTable.writeSums(spark, path, v2, "id")
    val live = VersionedTable.readVersion(spark, path, v2)
    val want = live.agg(sum($"id")).head().getLong(0)
    assert(VersionedTable.sumAtLive(spark, path, v2, "id") === Some(want))
    assert(VersionedTable.partitionSumsLive(spark, path, v2, "p", "id") ===
      Some(live.groupBy($"p").agg(sum($"id")).collect()
        .map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1).toSeq))
  }

  test("mega-manifest rel restriction: semi-join path identical to isin path") {
    // a 100 TB manifest carries 10^5-10^6 files; the rel restriction
    // every DV consumer applies must not inflate the expression tree
    // with one literal per file. Past graft.dv.isinMaxRels the guard
    // switches to a broadcast semi-join — force that path (threshold 0)
    // and assert reads and every live metadata face are byte-identical
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(200).select($"id", ($"id" % 4).cast("string").as("p")),
      path, "p")
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 3 === 0)
    // dangling marks too: rewrite partition 0 so its marks must be excluded
    val v2 = VersionedTable.commitPartitioned(
      spark.range(2000, 2010).select($"id", lit("0").as("p")),
      path, "p", "overwritePartitions")
    VersionedTable.writeCounts(spark, path, v2)
    VersionedTable.writeSums(spark, path, v2, "id")
    val isinRead = ids(VersionedTable.readVersion(spark, path, v2))
    val isinCount = VersionedTable.countAtLive(spark, path, v2)
    val isinSum = VersionedTable.sumAtLive(spark, path, v2, "id")
    spark.conf.set("graft.dv.isinMaxRels", "0")
    try {
      assert(ids(VersionedTable.readVersion(spark, path, v2)) === isinRead)
      assert(VersionedTable.countAtLive(spark, path, v2) === isinCount)
      assert(VersionedTable.sumAtLive(spark, path, v2, "id") === isinSum)
      assert(VersionedTable.readVersion(spark, path, v1).count() ===
        200 - (0 until 200).count(_ % 3 == 0))
    } finally spark.conf.unset("graft.dv.isinMaxRels")
  }

  test("vacuum keeps DV shards of retained versions, sweeps dropped ones") {
    val path = fresh()
    VersionedTable.create(spark.range(40).toDF("id").repartition(2), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") < 10)   // shard A
    VersionedTable.deleteWhere(spark, path, col("id") >= 35)           // shard B
    VersionedTable.commit(spark.range(100, 110).toDF("id"), path, "overwrite")
    val v4 = VersionedTable.deleteWhere(spark, path, col("id") === 105L) // shard C
    // retain the last two versions: v3 (overwrite, no DV) + v4 (shard C)
    VersionedTable.vacuum(path, keepVersions = 2, minAgeMs = 0L)
    assert(VersionedTable.versions(path) === Seq(3L, 4L))
    // shards A/B swept, C alive; the retained read is exact
    val dvDir = java.nio.file.Paths.get(path, "dv")
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(dvDir)
    val left = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".dv")).toSeq finally s.close()
    assert(left.toSet === VersionedTable.dvsAt(path, v4)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet)
    assert(ids(VersionedTable.readVersion(spark, path, v4)) ===
      (100L until 110L).filterNot(_ == 105L))
    intercept[IllegalArgumentException](
      VersionedTable.readVersion(spark, path, v1))
  }

  test("stream source: initial snapshot is DV-aware; a later delete poisons the stream") {
    val path = fresh()
    VersionedTable.create(spark.range(30).toDF("id").repartition(2), path)
    VersionedTable.deleteWhere(spark, path, col("id") % 3 === 0)
    VersionedTable.commit(spark.range(100, 105).toDF("id"), path, "append")
    val q = spark.readStream
      .format("org.apache.spark.sql.graftx.VersionedTableStreamProvider")
      .option("path", path).load()
      .writeStream.format("memory").queryName("dv_stream_sink").start()
    try q.processAllAvailable() finally q.stop()
    assert(ids(spark.table("dv_stream_sink")) ===
      ((0L until 30L).filterNot(_ % 3 == 0) ++ (100L until 105L)))
    // a delete AFTER the consumed offset is not append-like: the stream
    // must fail loudly instead of silently never retracting
    VersionedTable.deleteWhere(spark, path, col("id") === 101L)
    val q2 = spark.readStream
      .format("org.apache.spark.sql.graftx.VersionedTableStreamProvider")
      .option("path", path).load()
      .writeStream.format("memory").queryName("dv_stream_sink2").start()
    try {
      // first batch (snapshot at the delete version) is fine...
      q2.processAllAvailable()
      VersionedTable.deleteWhere(spark, path, col("id") === 102L)
      // ...the post-snapshot delete version poisons the walk
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("append-only")))
    } finally q2.stop()
  }

  test("upsertStreamBatch: exactly-once merge sink — replays are no-ops") {
    val path = fresh()
    VersionedTable.create(
      spark.range(10).select($"id", ($"id" * 10).as("x")), path)
    val b0 = Seq((3L, 333L), (100L, 1L)).toDF("id", "x")
    assert(VersionedTable.upsertStreamBatch(b0, path, Seq("id"), "s1", 0L)
      === Some(1L))
    // replay of batch 0 (crash between commit and checkpoint advance)
    assert(VersionedTable.upsertStreamBatch(b0, path, Seq("id"), "s1", 0L)
      === None)
    val afterReplay = VersionedTable.read(spark, path)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want1 = ((0L until 10L).filterNot(_ == 3).map(i => (i, i * 10))
      ++ Seq((3L, 333L), (100L, 1L))).sortBy(_._1)
    assert(afterReplay === want1)
    // next batch applies on top
    assert(VersionedTable.upsertStreamBatch(
      Seq((3L, -3L)).toDF("id", "x"), path, Seq("id"), "s1", 1L) === Some(2L))
    val after2 = VersionedTable.read(spark, path)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(after2 === want1.map { case (3L, _) => (3L, -3L); case r => r })
  }

  test("deleteWhere with pruneRanges: stats-pruned scan, identical result") {
    val path = fresh()
    // range-clustered files -> tight per-file [min,max] -> real pruning
    VersionedTable.create(
      spark.range(1000).toDF("id").repartitionByRange(8, col("id")), path)
    VersionedTable.writeStats(spark, path, 0L, "id")
    // the hint is implied by the predicate: id in [100, 150]
    val cands = VersionedTable.deleteCandidates(path, 0L, Seq(("id", 100L, 150L)))
    assert(cands.length < VersionedTable.filesAt(path, 0L).length,
      s"stats pruned nothing: ${cands.length} candidates")
    val v1 = VersionedTable.deleteWhere(spark, path,
      col("id") >= 100 && col("id") <= 150 && col("id") % 2 === 0,
      Seq(("id", 100L, 150L)))
    assert(ids(VersionedTable.readVersion(spark, path, v1)) ===
      (0L until 1000L).filterNot(i => i >= 100 && i <= 150 && i % 2 == 0))
    // a hint that prunes EVERYTHING is a no-op: no version published
    assert(VersionedTable.deleteWhere(spark, path,
      col("id") > 5000, Seq(("id", 5000L, 6000L))) === v1)
    assert(VersionedTable.latestVersion(path) === Some(v1))
    // second pruned delete composes with the existing DVs
    val v3 = VersionedTable.deleteWhere(spark, path,
      col("id") >= 120 && col("id") <= 130, Seq(("id", 120L, 130L)))
    assert(ids(VersionedTable.readVersion(spark, path, v3)) ===
      (0L until 1000L).filterNot(i =>
        (i >= 100 && i <= 150 && i % 2 == 0) || (i >= 120 && i <= 130)))
  }

  test("restore rolls back as a new commit, carrying the target's DVs") {
    val path = fresh()
    VersionedTable.create(spark.range(20).toDF("id"), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 4 === 0)
    VersionedTable.commit(spark.range(100, 103).toDF("id"), path, "overwrite")
    // undo the overwrite: back to the DV-bearing v1
    val v3 = VersionedTable.restore(path, v1)
    assert(v3 === 3L)
    assert(ids(VersionedTable.read(spark, path)) ===
      (0L until 20L).filterNot(_ % 4 == 0))
    assert(VersionedTable.hasDeletes(path, v3))
    // history intact: the overwrite version still reads
    assert(ids(VersionedTable.readVersion(spark, path, 2)) === (100L until 103L))
    // restore to v0: pre-delete rows all return
    VersionedTable.restore(path, 0L)
    assert(ids(VersionedTable.read(spark, path)) === (0L until 20L))
    intercept[IllegalArgumentException](VersionedTable.restore(path, 99L))
  }

  test("cloneTable: zero-copy branch — commits and deletes on the clone never touch the source") {
    val src = fresh()
    VersionedTable.create(spark.range(30).toDF("id").repartition(2), src)
    VersionedTable.deleteWhere(spark, src, col("id") >= 25) // source DVs borrow too
    val dst = fresh()
    VersionedTable.cloneTable(src, dst)
    assert(ids(VersionedTable.read(spark, dst)) === (0L until 25L))
    // the clone's v0 wrote NO data bytes of its own
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "data")))
    // diverge the clone: append + a DV delete on BORROWED files
    VersionedTable.commit(spark.range(100, 105).toDF("id"), dst, "append")
    VersionedTable.deleteWhere(spark, dst, col("id") % 5 === 0)
    assert(ids(VersionedTable.read(spark, dst)) ===
      ((0L until 25L) ++ (100L until 105L)).filterNot(_ % 5 == 0))
    // the source never moved
    assert(ids(VersionedTable.read(spark, src)) === (0L until 25L))
    // subset read on the clone still applies DVs on borrowed files
    VersionedTable.writeStats(spark, dst, VersionedTable.latestVersion(dst).get, "id")
    assert(ids(VersionedTable.readWhere(spark, dst,
      VersionedTable.latestVersion(dst).get, "id", 0L, 24L)) ===
      (0L until 25L).filterNot(_ % 5 == 0))
    // compact localizes: no borrowed reference remains afterwards
    val vc = VersionedTable.compact(spark, dst, 64L * 1024 * 1024)
    val srcRoot = java.nio.file.Paths.get(src).toString
    assert(VersionedTable.filesAt(dst, vc).forall(f => !f.contains(srcRoot)))
    assert(ids(VersionedTable.read(spark, dst)) ===
      ((0L until 25L) ++ (100L until 105L)).filterNot(_ % 5 == 0))
  }

  test("history: the audit face reports version, action, files, DV shards") {
    val path = fresh()
    VersionedTable.create(spark.range(10).toDF("id").repartition(2), path)
    VersionedTable.deleteWhere(spark, path, col("id") === 1L)
    VersionedTable.commit(spark.range(10, 12).toDF("id"), path, "append")
    val h = VersionedTable.history(spark, path)
      .select("version", "action", "n_files", "n_dv_shards")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(h.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(h.map(_._2).toSeq === Seq("create", "delete-dv", "append"))
    assert(h(1)._3 === h(0)._3)       // delete rewrote no data file
    assert(h(1)._4 >= 1)              // ...but carries a DV shard
    assert(h(2)._3 > h(1)._3)         // append added files
  }

  test("cdc-cow and append commits carry DVs; compact on partitions keeps them") {
    val path = fresh()
    VersionedTable.create(
      spark.range(60).select($"id", ($"id" * 2).as("x")).repartition(3), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 3 === 0)
    // append: new rows land, old deletes survive
    val v2 = VersionedTable.commit(
      spark.range(1000, 1005).select($"id", ($"id" * 2).as("x")), path, "append")
    assert(ids(VersionedTable.readVersion(spark, path, v2)) ===
      ((0L until 60L).filterNot(_ % 3 == 0) ++ (1000L until 1005L)))
    // cdc-cow on the DV-bearing table must not resurrect deleted rows
    VersionedTable.writeStats(spark, path, v2, "id")
    val changes = Seq((1L, 111L, "changed"), (2000L, 1L, "added"))
      .toDF("id", "x_new", "change")
    val v3 = VersionedTable.commitCdcCow(spark, path, changes, "id", Seq("x"))
    val got = VersionedTable.readVersion(spark, path, v3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = ((0L until 60L).filterNot(_ % 3 == 0).map(i =>
        (i, if (i == 1) 111L else i * 2)) ++
      (1000L until 1005L).map(i => (i, i * 2)) :+ (2000L, 1L)).sortBy(_._1)
    assert(got === want)
  }

  test("coalesceDv: backlog shards collapse, zero data bytes, identical reads") {
    val path = fresh()
    VersionedTable.create(
      spark.range(200).select($"id", ($"id" * 3).as("x")).repartition(4), path)
    VersionedTable.deleteWhere(spark, path, col("id") % 11 === 0)
    VersionedTable.deleteWhere(spark, path, col("id") % 13 === 0)
    val v3 = VersionedTable.deleteWhere(spark, path, col("id") % 17 === 0)
    val before = dataFiles(path)
    val shardsBefore = VersionedTable.dvsAt(path, v3).size
    assert(shardsBefore >= 3) // one-plus per delete commit, cumulative carry
    val wantIds = ids(VersionedTable.readVersion(spark, path, v3))

    val v4 = VersionedTable.coalesceDv(spark, path)
    assert(v4 === v3 + 1)
    // not a single data byte moved; the mark SET is preserved
    assert(dataFiles(path) === before)
    assert(VersionedTable.dvsAt(path, v4).size === 1)
    assert(ids(VersionedTable.readVersion(spark, path, v4)) === wantIds)
    // prior versions keep their own shards (vacuum reclaims them later)
    assert(ids(VersionedTable.readVersion(spark, path, v3)) === wantIds)
    // live metadata faces unchanged across the coalesce
    VersionedTable.writeCounts(spark, path, v4)
    VersionedTable.writeSums(spark, path, v4, "x")
    assert(VersionedTable.countAtLive(spark, path, v4) ===
      Some(wantIds.size.toLong))
    assert(VersionedTable.sumAtLive(spark, path, v4, "x") ===
      Some(wantIds.map(_ * 3).sum))
    // below minShards the pass is a no-op: no empty commit spam
    assert(VersionedTable.coalesceDv(spark, path) === v4)
  }

  test("coalesceDv: all-dangling backlog drops DVs and re-enables physical faces") {
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(40).select($"id", ($"id" % 2).cast("string").as("p")),
      path, "p")
    // marks ONLY in partition 0, then replace partition 0 wholesale:
    // every mark dangles (excluded from reads, but the bytes linger)
    VersionedTable.deleteWhere(spark, path, col("p") === "0" && col("id") < 10)
    VersionedTable.deleteWhere(spark, path, col("p") === "0" && col("id") >= 30)
    val v3 = VersionedTable.commitPartitioned(
      spark.range(100, 105).select($"id", lit("0").as("p")),
      path, "p", "overwritePartitions")
    assert(VersionedTable.hasDeletes(path, v3))
    val want = ids(VersionedTable.readVersion(spark, path, v3))
    val v4 = VersionedTable.coalesceDv(spark, path)
    assert(!VersionedTable.hasDeletes(path, v4))
    assert(ids(VersionedTable.readVersion(spark, path, v4)) === want)
    // no DVs at the new head: the exact-physical faces answer again
    VersionedTable.writeCounts(spark, path, v4)
    assert(VersionedTable.countAt(path, v4) === Some(want.size.toLong))
  }

  test("coalesceDv lifecycle: partitioned carry, further deletes, vacuum reclaims old shards") {
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(90).select($"id", ($"id" % 3).cast("string").as("p")),
      path, "p")
    VersionedTable.deleteWhere(spark, path, col("id") % 5 === 0)
    VersionedTable.deleteWhere(spark, path, col("id") % 7 === 0)
    val vCo = VersionedTable.coalesceDv(spark, path)
    val coShards = VersionedTable.dvsAt(path, vCo).map(new java.io.File(_).getName)
    // deletes keep accumulating ON TOP of the coalesced shard set
    val v4 = VersionedTable.deleteWhere(spark, path, col("id") % 11 === 0)
    val want = (0L until 90L).filterNot(i => i % 5 == 0 || i % 7 == 0 || i % 11 == 0)
    assert(ids(VersionedTable.readVersion(spark, path, v4)) === want)
    // per-partition live faces correct across the coalesce boundary
    VersionedTable.writeCounts(spark, path, v4)
    assert(VersionedTable.partitionRowCountsLive(spark, path, v4, "p") ===
      Some(want.groupBy(i => (i % 3).toString).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)))
    // vacuum to the newest version: the pre-coalesce shards (referenced
    // only by dropped manifests) are reclaimed, the live set survives
    VersionedTable.vacuum(path, keepVersions = 1, minAgeMs = 0L)
    val left = new java.io.File(path, "dv").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // local-FS .crc companions
    val liveShards = VersionedTable.dvsAt(path, v4).map(new java.io.File(_).getName).toSet
    assert(left === liveShards)
    assert(coShards.forall(liveShards)) // v4 still carries the coalesced shard
    assert(ids(VersionedTable.read(spark, path)) === want)
  }

  test("restore on a shallow clone carries borrowed absolute refs verbatim") {
    val src = fresh()
    val dst = fresh()
    VersionedTable.create(spark.range(30).toDF("id").repartition(2), src)
    VersionedTable.cloneTable(src, dst)
    // diverge the clone, then roll it back to the borrowed v0
    VersionedTable.commit(spark.range(100, 105).toDF("id"), dst, "append")
    val v2 = VersionedTable.restore(dst, 0L)
    // the restored manifest must still point into the SOURCE's data —
    // relOf-style re-relativization would mangle the borrowed paths
    assert(ids(VersionedTable.readVersion(spark, dst, v2)) === (0L until 30L))
    VersionedTable.releaseClone(src, dst)
  }

  test("dropEmpty: fully-deleted partition matches GROUP BY over live rows") {
    // default faces report the fully-deleted partition as (key, 0) —
    // the manifest-list semantics; dropEmpty = true matches the
    // grouped live read, which OMITS it (the oracle-replay shape)
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(60).select($"id", ($"id" % 3).cast("string").as("p")),
      path, "p")
    // partition "1" fully deleted; "0" partially; "2" untouched
    val v1 = VersionedTable.deleteWhere(spark, path,
      col("p") === "1" || col("id") % 5 === 0)
    VersionedTable.writeCounts(spark, path, v1)
    VersionedTable.writeSums(spark, path, v1, "id")
    val live = VersionedTable.readVersion(spark, path, v1)
    val wantCounts = live.groupBy($"p").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1).toSeq
    val wantSums = live.groupBy($"p").agg(sum($"id"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1).toSeq
    assert(!wantCounts.exists(_._1 == "1")) // GROUP BY omits it
    assert(VersionedTable.partitionRowCountsLive(spark, path, v1, "p",
      dropEmpty = true) === Some(wantCounts))
    assert(VersionedTable.partitionSumsLive(spark, path, v1, "p", "id",
      dropEmpty = true) === Some(wantSums))
    // default keeps the zero row: manifest-list semantics, zip-aligned
    val defCounts = VersionedTable.partitionRowCountsLive(spark, path, v1, "p").get
    val defSums = VersionedTable.partitionSumsLive(spark, path, v1, "p", "id").get
    assert(defCounts.find(_._1 == "1") === Some("1" -> 0L))
    assert(defSums.find(_._1 == "1") === Some("1" -> 0L))
    assert(defCounts.map(_._1) === defSums.map(_._1))
  }

  test("dropEmpty sums need the counts sidecar (coverage rule, not best-effort)") {
    val path = fresh()
    VersionedTable.createPartitioned(
      spark.range(20).select($"id", ($"id" % 2).cast("string").as("p")),
      path, "p")
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") % 4 === 0)
    VersionedTable.writeSums(spark, path, v1, "id") // counts sidecar MISSING
    assert(VersionedTable.partitionSumsLive(spark, path, v1, "p", "id",
      dropEmpty = true) === None)
    // the default face answers from the sums sidecar alone
    assert(VersionedTable.partitionSumsLive(spark, path, v1, "p", "id").isDefined)
  }

  test("malformed graft.dv.* session conf fails with the key name, not NFE") {
    val path = fresh()
    VersionedTable.create(spark.range(10).toDF("id"), path)
    val v1 = VersionedTable.deleteWhere(spark, path, col("id") === 3L)
    VersionedTable.writeCounts(spark, path, v1)
    spark.conf.set("graft.dv.broadcastBytes", "lots")
    try {
      val e = intercept[IllegalArgumentException](
        VersionedTable.read(spark, path).count())
      assert(e.getMessage.contains("graft.dv.broadcastBytes"))
    } finally spark.conf.unset("graft.dv.broadcastBytes")
    spark.conf.set("graft.dv.isinMaxRels", "1e5")
    try {
      val e = intercept[IllegalArgumentException](
        VersionedTable.countAtLive(spark, path, 1L))
      assert(e.getMessage.contains("graft.dv.isinMaxRels"))
    } finally spark.conf.unset("graft.dv.isinMaxRels")
  }
}
