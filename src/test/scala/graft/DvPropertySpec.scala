package graft

import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Differential model check for the merge-on-read table: a seeded
  * random sequence of delete / upsert / append / restore / compact ops
  * runs against BOTH the table and a driver-side reference model
  * (id → value map, full version history), and every version must read
  * back exactly the model's state — the same sequential-model
  * discipline OrderPropertySpec applies to row order. Catches
  * cross-op interactions no single-op spec plants (DV accumulation
  * across restores, upserts over purged deletes, appends between). */
class DvPropertySpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    java.nio.file.Files.createTempDirectory("graft_dvprop").toString + "/t"

  private def tableState(path: String, v: Long): Map[Long, Long] =
    VersionedTable.readVersion(spark, path, v)
      .as[(Long, Long)].collect().toMap

  test("random op sequences: table == model at every version (seeded)") {
    val rnd = new scala.util.Random(20260816L)
    val path = fresh()
    val init = (0L until 500L).map(i => i -> i * 10).toMap
    VersionedTable.create(init.toSeq.toDF("id", "x").repartition(4), path)

    // model[v] = the full keyed state at version v
    val model = scala.collection.mutable.ArrayBuffer[Map[Long, Long]](init)
    var nextId = 10000L

    for (step <- 1 to 18) {
      val cur = model.length - 1L
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // delete a random residue class
          val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
          val v = VersionedTable.deleteWhere(spark, path,
            pmod(col("id"), lit(m.toLong)) === r.toLong)
          val after = model.last.filterNot { case (id, _) =>
            java.lang.Math.floorMod(id, m.toLong) == r.toLong }
          if (after == model.last) assert(v === cur) // no-op: no publish
          else { assert(v === cur + 1); model += after }
        case 3 | 4 | 5 => // upsert: update a random slice + fresh inserts
          val upd = model.last.keys.filter(_ % 5 == rnd.nextInt(5)).take(40)
            .map(id => id -> rnd.nextLong(1000000L)).toMap
          val ins = (0 until 1 + rnd.nextInt(5))
            .map { _ => nextId += 1; nextId -> rnd.nextLong(1000000L) }.toMap
          val src = (upd ++ ins).toSeq.toDF("id", "x")
          assert(VersionedTable.upsert(spark, path, src, Seq("id")) === cur + 1)
          model += (model.last ++ upd ++ ins)
        case 6 | 7 => // blind append of fresh ids
          val rows = (0 until 5 + rnd.nextInt(20))
            .map { _ => nextId += 1; nextId -> rnd.nextLong(1000000L) }.toMap
          assert(VersionedTable.commit(
            rows.toSeq.toDF("id", "x"), path, "append") === cur + 1)
          model += (model.last ++ rows)
        case 8 => // restore to a random earlier version
          val toV = rnd.nextInt(model.length).toLong
          assert(VersionedTable.restore(path, toV) === cur + 1)
          model += model(toV.toInt)
        case 9 => // physical purge: content-identical layout commit
          assert(VersionedTable.compact(
            spark, path, 64L * 1024 * 1024) === cur + 1)
          model += model.last
      }
      // the new head must equal the model head
      assert(tableState(path, model.length - 1L) === model.last,
        s"divergence after step $step (${VersionedTable.actionAt(path, model.length - 1L)})")
    }
    // and EVERY historical version must still time-travel to its state
    for (v <- model.indices)
      assert(tableState(path, v.toLong) === model(v),
        s"time travel to v$v diverged")
    // live metadata count agrees wherever the counts sidecar covers it
    val head = model.length - 1L
    VersionedTable.writeCounts(spark, path, head)
    assert(VersionedTable.countAtLive(spark, path, head)
      === Some(model.last.size.toLong))
  }
}
