package graft

import graft.operators.{Diff, Stats}
import org.apache.spark.sql.functions._

/** Snapshot diff semantics and PSI drift hand-computed cases. */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff tags added/removed/changed/unchanged; null-safe compare") {
    val old = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None: Option[String]), (5L, Option("e"))).toDF("id", "v")
    val neu = Seq(
      (1L, Option("a")),               // unchanged
      (2L, Option("B")),               // changed
      (4L, Option("now")),             // null -> value = changed
      (5L, None: Option[String]),      // value -> null = changed
      (6L, Option("f"))).toDF("id", "v") // added; 3 removed
    val got = Diff.snapshotDiff(old, neu, Seq("id"), Seq("v"))
      .select($"id", $"change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"))
  }

  test("snapshotDiff with no compare columns is pure membership") {
    val old = Seq(1L, 2L).toDF("id")
    val neu = Seq(2L, 3L).toDF("id")
    val got = Diff.snapshotDiff(old, neu, Seq("id"), Nil)
      .select($"id", $"change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("applyChanges roundtrip: old + snapshotDiff(old, new) == new, incl. null transitions") {
    val old = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None: Option[String]), (5L, Option("e"))).toDF("id", "v")
    val neu = Seq(
      (1L, Option("a")), (2L, Option("B")), (4L, Option("now")),
      (5L, None: Option[String]), (6L, Option("f"))).toDF("id", "v")
    val changes = Diff.snapshotDiff(old, neu, Seq("id"), Seq("v"))
      .filter(col("change") =!= "unchanged")
    val merged = Diff.applyChanges(old, changes, Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(merged == neu.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet)
    // unfiltered diff (unchanged rows present) applies identically
    val mergedAll = Diff.applyChanges(old,
        Diff.snapshotDiff(old, neu, Seq("id"), Seq("v")), Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(mergedAll == merged)
    // seeded random churn: the roundtrip holds on arbitrary edit mixes
    val rnd = new scala.util.Random(41)
    val o2 = (0L until 300L).map(i => (i, Option(s"v$i"))).toDF("id", "v")
    val n2 = (0L until 340L).flatMap { i =>
      if (i < 300 && rnd.nextDouble() < 0.15) None // removed
      else if (i >= 300 && rnd.nextDouble() < 0.5) None // never added
      else Some((i, if (rnd.nextDouble() < 0.2) None else Option(s"v${i}${rnd.nextInt(3)}")))
    }.toDF("id", "v")
    val m2 = Diff.applyChanges(o2,
        Diff.snapshotDiff(o2, n2, Seq("id"), Seq("v")), Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(m2 == n2.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet)
  }

  test("maintainAgg: maintained rollup == recomputed, incl. key moves and group extinction") {
    import org.apache.spark.sql.types.DecimalType
    def mkAgg(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("k"))
      .agg(sum(col("m").cast(DecimalType(38, 4))).as("m_sum"), count(lit(1)).as("n"))
    // old release: groups a (2 rows), b (2), c (1)
    val old = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "b", 40L), (5L, "c", 50L)).toDF("id", "k", "m")
    // new: id2 re-labeled a->b (KEY MOVE), id3 measure edit, id5 removed
    // (group c goes EXTINCT), id6 added into new group d
    val neu = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 31L),
      (4L, "b", 40L), (6L, "d", 60L)).toDF("id", "k", "m")
    val changes = Diff.snapshotDiff(old, neu, Seq("id"), Seq("k", "m"))
      .filter(col("change") =!= "unchanged")
    val maintained = Diff.maintainAgg(mkAgg(old), changes, Seq("k"), Seq("m"))
      .collect().map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
    val recomputed = mkAgg(neu)
      .collect().map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
    assert(maintained == recomputed, s"maintained $maintained vs $recomputed")
    assert(!maintained.exists(_._1 == "c"), "extinct group must vanish")
    // seeded random churn differential — INCLUDING null grouping keys
    // (groupBy puts nulls in a real group; the merge join must be
    // null-safe or that group splits in two)
    val rnd = new scala.util.Random(31)
    def key(i: Long): Option[String] =
      if (i % 11 == 0) None else Some(s"k${(i % 7)}")
    val o2 = (0L until 400L).map(i => (i, key(i), (i % 13) + 1)).toDF("id", "k", "m")
    val n2 = (0L until 430L).flatMap { i =>
      if (i < 400 && rnd.nextDouble() < 0.2) None
      else if (i >= 400 && rnd.nextDouble() < 0.5) None
      else Some((i,
        if (rnd.nextDouble() < 0.1) Option.empty[String] else Some(s"k${rnd.nextInt(7)}"),
        (rnd.nextInt(13) + 1).toLong))
    }.toDF("id", "k", "m")
    val ch2 = Diff.snapshotDiff(o2, n2, Seq("id"), Seq("k", "m"))
      .filter(col("change") =!= "unchanged")
    val m2 = Diff.maintainAgg(mkAgg(o2), ch2, Seq("k"), Seq("m"))
      .collect().map(r => (Option(r.getString(0)), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
    val r2 = mkAgg(n2)
      .collect().map(r => (Option(r.getString(0)), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
    assert(m2 == r2)
    assert(m2.exists(_._1.isEmpty), "null-key group must be maintained as ONE group")
  }

  test("maintainAgg as a foreachBatch consumer keeps the rollup fresh across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types.DecimalType
    // the end-to-end CDC story: change batches stream in, the standing
    // rollup is refreshed incrementally per micro-batch — never a full
    // rescan. localCheckpoint per refresh keeps lineage flat (the
    // production consumer would write the rollup table per batch).
    def mkAgg(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("k"))
      .agg(sum(col("m").cast(DecimalType(38, 4))).as("m_sum"), count(lit(1)).as("n"))
    val r0 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "k", "m")
    val r1 = Seq((1L, "a", 10L), (2L, "b", 21L), (4L, "c", 40L)).toDF("id", "k", "m") // move+edit, del 3, add 4
    val r2 = Seq((1L, "a", 10L), (2L, "b", 21L), (5L, "c", 50L)).toDF("id", "k", "m") // del 4, add 5
    val ch1 = Diff.snapshotDiff(r0, r1, Seq("id"), Seq("k", "m"))
      .filter(col("change") =!= "unchanged").collect()
    val ch2 = Diff.snapshotDiff(r1, r2, Seq("id"), Seq("k", "m"))
      .filter(col("change") =!= "unchanged").collect()
    val chSchema = Diff.snapshotDiff(r0, r1, Seq("id"), Seq("k", "m")).schema

    @volatile var rollup = mkAgg(r0).localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = input.toDF.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // each tick carries one release's change set (stand-in for a CDC
        // source emitting diff-shaped rows)
        val ticks = batch.select("value").collect().map(_.getInt(0))
        ticks.sorted.foreach { t =>
          import scala.jdk.CollectionConverters._
          val rows: Seq[org.apache.spark.sql.Row] = (if (t == 1) ch1 else ch2).toSeq
          val changes = spark.createDataFrame(rows.asJava, chSchema)
          val next = Diff.maintainAgg(rollup, changes, Seq("k"), Seq("m"))
            .localCheckpoint()
          org.apache.spark.sql.graftx.Bridge.freeCheckpoint(rollup)
          rollup = next
        }
      }
      .start()
    try {
      input.addData(1)
      q.processAllAvailable()
      input.addData(2) // second release lands in a LATER micro-batch
      q.processAllAvailable()
      val got = rollup.collect()
        .map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
      val want = mkAgg(r2).collect()
        .map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getLong(2))).toSet
      assert(got == want, s"streamed rollup $got vs recompute $want")
    } finally q.stop()
  }

  test("minhashIndexMaintain as a foreachBatch consumer keeps the LSH index fresh across micro-batches") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    // the streaming leg of the dedup-index refresh story: release change
    // sets arrive in separate micro-batches, the standing signature
    // index refreshes per batch — never a full re-sign
    def mkTexts(seed: Int, n: Int) = {
      val rnd = new scala.util.Random(seed)
      val words = Vector("one", "two", "three", "four", "five", "six")
      (0L until n.toLong).map(i =>
        (i, Seq.fill(5 + rnd.nextInt(5))(words(rnd.nextInt(words.length))).mkString(" ")))
    }
    val r0 = mkTexts(1, 60).toDF("id", "text")
    val r1 = mkTexts(1, 60).filterNot(_._1 % 9 == 0)
      .map { case (i, t0) => if (i % 4 == 0) (i, t0 + " edited") else (i, t0) }
      .toDF("id", "text")
    val r2raw = mkTexts(1, 60).filterNot(i => i._1 % 9 == 0 || i._1 % 7 == 0)
      .map { case (i, t0) => if (i % 4 == 0) (i, t0 + " edited") else (i, t0) } ++
      (500L until 510L).map(i => (i, s"brand new doc number $i with words"))
    val r2 = r2raw.toDF("id", "text")
    def ch(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Diff.snapshotDiff(a, b, Seq("id"), Seq("text")).filter(col("change") =!= "unchanged")
    val ch1 = ch(r0, r1).collect()
    val ch2 = ch(r1, r2).collect()
    val chSchema = ch(r0, r1).schema
    def sigs(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(d, "text", "id", k = 8, shingleN = 3)

    @volatile var index = sigs(r0).localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = input.toDF.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ticks = batch.select("value").collect().map(_.getInt(0))
        ticks.sorted.foreach { t =>
          import scala.jdk.CollectionConverters._
          val rows: Seq[org.apache.spark.sql.Row] = (if (t == 1) ch1 else ch2).toSeq
          val changes = spark.createDataFrame(rows.asJava, chSchema)
          val next = Dedup.minhashIndexMaintain(index, changes, "text", "id",
            k = 8, shingleN = 3).localCheckpoint()
          org.apache.spark.sql.graftx.Bridge.freeCheckpoint(index)
          index = next
        }
      }
      .start()
    try {
      input.addData(1)
      q.processAllAvailable()
      input.addData(2)
      q.processAllAvailable()
      val got = index.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      val want = sigs(r2).collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      assert(got == want, "streamed index must equal full re-sign of the latest release")
    } finally q.stop()
  }

  test("SCD2: intervals close/open per release; current == applyChanges; asOf time-travels") {
    val r0 = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c"))).toDF("id", "v")
    val r1 = Seq((1L, Option("a")), (2L, Option("B")), (4L, Option("d"))).toDF("id", "v")
    val r2 = Seq((1L, Option("A")), (2L, Option("B")), (5L, Option("e"))).toDF("id", "v")
    def ch(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Diff.snapshotDiff(a, b, Seq("id"), Seq("v")).filter(col("change") =!= "unchanged")
    val h1 = Diff.scd2Init(r0, Seq("id"), Seq("v"), 1)
    val h2 = Diff.applyChangesScd2(h1, ch(r0, r1), Seq("id"), Seq("v"), 2)
    val h3 = Diff.applyChangesScd2(h2, ch(r1, r2), Seq("id"), Seq("v"), 3)
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // current == the merge path's snapshot at every release
    assert(snap(Diff.scd2Current(h3)) == snap(r2))
    assert(snap(Diff.scd2AsOf(h3, 2)) == snap(r1)) // time travel to v2
    assert(snap(Diff.scd2AsOf(h3, 1)) == snap(r0)) // ... and v1
    // interval audit: id 2 has exactly one closed (1->2) + one open (2->)
    val id2 = h3.filter(col("id") === 2L)
      .select("v", "valid_from", "valid_to").collect()
      .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toSet
    assert(id2 == Set(("b", 1, Some(2)), ("B", 2, None)))
    // removed id 3 is closed and never reopened; history rows = old + churn
    assert(h3.filter(col("id") === 3L).collect()
      .forall(r => r.getInt(r.fieldIndex("valid_to")) == 2))
    assert(h3.count() == 3 + 2 + 2) // init + (v2 changed+added) + (v3 changed+added)
  }

  test("scd2EnrichAsOf: per-fact versions hit the covering interval; misses stay null") {
    val r0 = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c"))).toDF("id", "v")
    val r1 = Seq((1L, Option("a")), (2L, Option("B")), (4L, Option("d"))).toDF("id", "v")
    val r2 = Seq((1L, Option("A")), (2L, Option("B")), (5L, Option("e"))).toDF("id", "v")
    def ch(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Diff.snapshotDiff(a, b, Seq("id"), Seq("v")).filter(col("change") =!= "unchanged")
    val h3 = Diff.applyChangesScd2(
      Diff.applyChangesScd2(Diff.scd2Init(r0, Seq("id"), Seq("v"), 1),
        ch(r0, r1), Seq("id"), Seq("v"), 2),
      ch(r1, r2), Seq("id"), Seq("v"), 3).withColumnRenamed("v", "dim_v")
    val facts = Seq(
      (1L, 1), (1L, 3),       // changed at v3: sees "a" then "A"
      (2L, 2),                // changed at v2: sees "B"
      (3L, 3),                // removed at v2: null at v3
      (5L, 1), (5L, 3),       // added at v3: null at v1, "e" at v3
      (9L, 2))                // never existed: null
      .toDF("id", "asof")
    val got = Diff.scd2EnrichAsOf(facts, h3, Seq("id"), "asof")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 1, Some("a")), (1L, 3, Some("A")), (2L, 2, Some("B")),
      (3L, 3, None), (5L, 1, None), (5L, 3, Some("e")), (9L, 2, None)))
    // every fact survives exactly once (disjoint intervals -> at most one hit)
    assert(Diff.scd2EnrichAsOf(facts, h3, Seq("id"), "asof").count() == 7)
  }

  test("diffSummary counts by change type") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val neu = Seq((2L, "x"), (3L, "c")).toDF("id", "v")
    val got = Diff.diffSummary(old, neu, Seq("id"), Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("driftPsi: identical snapshots give ~zero psi on every bin") {
    val ref = (1 to 400).map(_.toDouble).toDF("x")
    val terms = Stats.driftPsi(ref, ref, "x", 4)
      .select($"psi_term").as[Double].collect()
    assert(terms.length === 4 && terms.forall(math.abs(_) < 1e-9))
  }

  test("driftPsi: hand-computed two-bin shift") {
    // ref: 100 values 1..100 — median boundary = 50.5 (N·q−0.5 lerp);
    // cur: 100 values all = 80 → bin0 (x<=50.5) holds 0, bin1 holds 100
    val ref = (1 to 100).map(_.toDouble).toDF("x")
    val cur = Seq.fill(100)(80.0).toDF("x")
    val rows = Stats.driftPsi(ref, cur, "x", 2)
      .orderBy($"bin")
      .select($"bin", $"n_ref", $"n_cur", $"p_ref", $"p_cur", $"psi_term")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((0L, 50L, 0L), (1L, 50L, 100L)))
    def r6(x: Double) = // Spark round() = HALF_UP
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pRef = r6(50.5 / 101.0)
    val pCur0 = r6(0.5 / 101.0)
    val pCur1 = r6(100.5 / 101.0)
    def term(pc: Double, pr: Double) = r6((pc - pr) * math.log(pc / pr))
    assert(rows(0)._6 === term(pCur0, pRef))
    assert(rows(1)._6 === term(pCur1, pRef))
    // a hard full-bin shift is far beyond the 0.25 action threshold
    assert(rows.map(_._6).sum > 0.25)
  }

  test("driftPsi: million-row snapshots keep empty-bin terms finite (1e-6 floor)") {
    val ref = spark.range(2000000).select($"id".cast("double").as("x"))
    val cur = spark.range(1000).select(lit(5.0).as("x")) // everything in bin 0
    val rows = Stats.driftPsi(ref, cur, "x", 4)
      .select($"psi_term").as[Double].collect()
    // without the floor, cur's empty bins round p to 0.0 -> ln(0) -> null
    assert(rows.length === 4 && rows.forall(t => !t.isNaN && !t.isInfinite))
    assert(rows.sum > 0.25) // the drift is still loudly visible
  }

  test("ivfIndexMaintain equals full re-assignment over a seeded random churn") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val cents = Array.fill(4)(vec())
    val oldRows = (0L until 200L).map(i => (i, vec()))
    // churn: every 7th removed, every 5th (surviving) re-embedded, 30 added
    val newRows = oldRows.filterNot(_._1 % 7 == 0).map { case (i, v) =>
      if (i % 5 == 0) (i, vec()) else (i, v)
    } ++ (1000L until 1030L).map(i => (i, vec()))
    val oldDf = oldRows.toDF("id", "v")
    val newDf = newRows.toDF("id", "v")
    val changes = Diff.snapshotDiff(oldDf, newDf, Seq("id"), Seq("v"))
      .filter(col("change") =!= "unchanged")
    val maintained = Similarity.ivfIndexMaintain(
      Similarity.ivfIndex(oldDf, "id", "v", cents), changes, "id", "v", cents)
      .orderBy("id").collect().toSeq
    val recomputed = Similarity.ivfIndex(newDf, "id", "v", cents)
      .orderBy("id").collect().toSeq
    assert(maintained == recomputed,
      "maintained index must equal full re-assignment bit for bit")
    // and the churn really is churn-sized: changes rows << corpus
    assert(changes.count() < 100)
  }

  test("minhashIndexMaintain equals full re-signing over a seeded random churn") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def text() = Seq.fill(6 + rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" ")
    val oldRows = (0L until 150L).map(i => (i, text()))
    // churn: every 7th removed, every 5th survivor rewritten, 20 added —
    // and one rewrite drops below shingleN tokens (must LEAVE the index)
    val newRows = oldRows.filterNot(_._1 % 7 == 0).map { case (i, t0) =>
      if (i == 10L) (i, "too short")
      else if (i % 5 == 0) (i, text()) else (i, t0)
    } ++ (1000L until 1020L).map(i => (i, text()))
    val oldDf = oldRows.toDF("id", "text")
    val newDf = newRows.toDF("id", "text")
    val changes = Diff.snapshotDiff(oldDf, newDf, Seq("id"), Seq("text"))
      .filter(col("change") =!= "unchanged")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(df, "text", "id", k = 8, shingleN = 3)
    val maintained = Dedup.minhashIndexMaintain(
        sigs(oldDf), changes, "text", "id", k = 8, shingleN = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val recomputed = sigs(newDf)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(maintained == recomputed,
      "maintained signature index must equal full re-signing bit for bit")
    assert(!maintained.exists(_._1 == 10L), "sub-shingle rewrite must leave the index")
    assert(changes.count() < 80) // churn-sized, not corpus-sized
  }

  test("driftPsi: empty current bins stay defined via smoothing") {
    val ref = (1 to 80).map(_.toDouble).toDF("x")
    val cur = Seq.fill(10)(1.0).toDF("x") // everything lands in bin 0
    val terms = Stats.driftPsi(ref, cur, "x", 8)
      .select($"psi_term").as[Double].collect()
    assert(terms.length === 8 && terms.forall(t => !t.isNaN && !t.isInfinite))
  }
}
