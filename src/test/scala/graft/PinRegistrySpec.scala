package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import graft.sources.VersionedTable

/** The pin-registry lock closing the clone/vacuum race: every
  * interleaving of pin-land vs liveness-decision vs sweep either
  * RETAINS the pinned version (pin first) or fails the clone loudly
  * BEFORE anything is published (sweep first) — no ordering can publish
  * a clone whose borrowed bytes a concurrent sweep removed. The lock's
  * test seams ([[VersionedTable.clonePinnedLockHook]] /
  * [[VersionedTable.vacuumSweepLockHook]]) stretch the critical
  * sections so the spec can prove the opposite operation BLOCKS at the
  * exact points that used to interleave. */
class PinRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    java.nio.file.Files.createTempDirectory("graft_pin").toString + "/t"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  /** v0 = 0..7, v1 = overwrite 8..11 — v0's files are droppable by a
    * keep-1 vacuum unless a pin retains them. */
  private def twoVersionTable(): String = {
    val src = fresh()
    VersionedTable.create(spark.range(8).toDF("id"), src)
    VersionedTable.commit(spark.range(8, 12).toDF("id"), src, "overwrite")
    src
  }

  test("pin in flight: a racing vacuum blocks, then retains — the ordering that used to corrupt") {
    val src = twoVersionTable()
    val dst = fresh()
    val pinLanded = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val vacuumDoneAt = new AtomicLong(0)
    val cloneErr = new AtomicReference[Throwable]()
    VersionedTable.clonePinnedLockHook = () => {
      pinLanded.countDown()
      release.await(30, TimeUnit.SECONDS); ()
    }
    try {
      val ct = new Thread(() =>
        try VersionedTable.cloneTable(src, dst, 0L)
        catch { case e: Throwable => cloneErr.set(e) })
      ct.start()
      assert(pinLanded.await(30, TimeUnit.SECONDS))
      // the pin has LANDED but the clone still holds the lock — the
      // pre-lock code would now let a vacuum that had already read the
      // (empty) pin set sweep v0's bytes under the publish
      val vt = new Thread(() => {
        VersionedTable.vacuum(src, 1, 0); vacuumDoneAt.set(System.nanoTime())
      })
      vt.start()
      Thread.sleep(500)
      assert(vacuumDoneAt.get() === 0L, "vacuum must block behind the pin lock")
      release.countDown()
      ct.join(60000); vt.join(60000)
      assert(!ct.isAlive && !vt.isAlive)
      if (cloneErr.get() != null) throw cloneErr.get()
      assert(vacuumDoneAt.get() !== 0L)
    } finally {
      VersionedTable.clonePinnedLockHook = () => ()
      release.countDown()
    }
    // the sweep SAW the pin: v0 retained (manifest and files), the
    // clone reads fully, and the source's head is untouched
    assert(VersionedTable.versions(src).contains(0L))
    assert(ids(VersionedTable.readVersion(spark, dst, 0L)) === (0L until 8L))
    assert(ids(VersionedTable.read(spark, src)) === (8L until 12L))
  }

  test("sweep in flight: racing clones block; dropped version fails loudly pre-publish, kept version clones fine") {
    val src = twoVersionTable()
    val dstGone = fresh()
    val dstOk = fresh()
    val sweepEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    VersionedTable.vacuumSweepLockHook = () => {
      sweepEntered.countDown()
      release.await(30, TimeUnit.SECONDS); ()
    }
    val goneErr = new AtomicReference[Throwable]()
    val okErr = new AtomicReference[Throwable]()
    try {
      val vt = new Thread(() => VersionedTable.vacuum(src, 1, 0))
      vt.start()
      assert(sweepEntered.await(30, TimeUnit.SECONDS))
      // two clones race the mid-flight sweep: one pins the version the
      // sweep is dropping (v0), one pins the version it keeps (v1)
      val ctGone = new Thread(() =>
        try VersionedTable.cloneTable(src, dstGone, 0L)
        catch { case e: Throwable => goneErr.set(e) })
      val ctOk = new Thread(() =>
        try VersionedTable.cloneTable(src, dstOk, 1L)
        catch { case e: Throwable => okErr.set(e) })
      ctGone.start(); ctOk.start()
      Thread.sleep(500)
      // the liveness decision is made and v0's fate sealed — neither
      // clone may interleave its pin into the sweep
      assert(ctGone.isAlive && ctOk.isAlive,
        "clones must block behind the sweep lock")
      release.countDown()
      vt.join(60000); ctGone.join(60000); ctOk.join(60000)
    } finally {
      VersionedTable.vacuumSweepLockHook = () => ()
      release.countDown()
    }
    // v0's clone failed BEFORE publishing anything: the named error, no
    // dst version, no leaked pin — exactly a clone of a vacuumed version
    assert(goneErr.get() != null, "clone of the swept version must fail")
    assert(goneErr.get().isInstanceOf[IllegalArgumentException])
    assert(goneErr.get().getMessage.contains("gone"))
    assert(VersionedTable.versions(dstGone).isEmpty)
    // v1's clone succeeded and reads fully; its pin is registered
    if (okErr.get() != null) throw okErr.get()
    assert(ids(VersionedTable.readVersion(spark, dstOk, 0L)) === (8L until 12L))
    assert(VersionedTable.pinnedVersions(src) === Set(1L))
  }

  test("pin before sweep (no concurrency): retained across repeated vacuums until released") {
    val src = twoVersionTable()
    val dst = fresh()
    VersionedTable.cloneTable(src, dst, 0L)
    VersionedTable.vacuum(src, 1, 0)
    VersionedTable.vacuum(src, 1, 0) // idempotent under the pin
    assert(VersionedTable.versions(src).contains(0L))
    assert(ids(VersionedTable.readVersion(spark, dst, 0L)) === (0L until 8L))
    // released: the next sweep reclaims v0
    VersionedTable.releaseClone(src, dst)
    VersionedTable.vacuum(src, 1, 0)
    assert(!VersionedTable.versions(src).contains(0L))
  }

  test("fenced lease steal: two concurrent stealers race ONE epoch create — exactly one proceeds") {
    val src = fresh()
    VersionedTable.create(spark.range(4).toDF("id"), src)
    val clones = java.nio.file.Paths.get(src, "_clones")
    java.nio.file.Files.createDirectories(clones)
    // a crashed holder's lock (legacy fixed name = epoch 0), lease long
    // expired: every waiter that lists it becomes a stealer
    val stale = clones.resolve(".registry.lock")
    java.nio.file.Files.write(stale,
      """{"owner":"dead","ts":0}""".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val fenced = clones.resolve(".registry.lock.1")
    val fenceEpochs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val bothAtFence = new CountDownLatch(2)
    val firstThrough = new java.util.concurrent.atomic.AtomicBoolean(true)
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val heldNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Park BOTH stealers at the fence so the steal is genuinely
    // concurrent, then let them race the epoch-1 create. The local FS's
    // create(overwrite=false) is check-then-act (the conditional-put
    // store arbitrates this natively), so the hook additionally lets
    // the first arrival's create LAND before the second attempts —
    // determinizing which side wins, not whether exactly one does.
    VersionedTable.stealFenceHook = e => {
      fenceEpochs.add(e)
      bothAtFence.countDown()
      assert(bothAtFence.await(30, TimeUnit.SECONDS), "both stealers at fence")
      if (!firstThrough.compareAndSet(true, false)) {
        val dl = System.currentTimeMillis() + 10000
        while (!java.nio.file.Files.exists(fenced) &&
            System.currentTimeMillis() < dl) Thread.sleep(10)
      }
    }
    try {
      def stealer(): Thread = {
        val t = new Thread(() =>
          VersionedTable.withRegistryLock(src, waitMs = 60000L) {
            val n = inBody.incrementAndGet()
            maxInBody.getAndUpdate(m => math.max(m, n))
            // record which epoch's file this holder is standing on
            val it = java.nio.file.Files.list(clones)
            try it.forEach(p =>
              if (p.getFileName.toString.startsWith(".registry.lock"))
                heldNames.add(p.getFileName.toString))
            finally it.close()
            Thread.sleep(250)
            inBody.decrementAndGet(); ()
          })
        t.start(); t
      }
      val a = stealer(); val b = stealer()
      a.join(60000); b.join(60000)
      assert(!a.isAlive && !b.isAlive)
    } finally VersionedTable.stealFenceHook = _ => ()
    // both attempted the SAME fence (epoch 1) — the steal was concurrent
    assert(fenceEpochs.toArray.toSeq === Seq(1L, 1L))
    // ...but the critical sections never overlapped
    assert(maxInBody.get() === 1, "both stealers entered the body at once")
    // the loser's epoch-1 create failed; it re-acquired AFTER the
    // winner's release at the NEXT epoch — never on the fenced name
    assert(heldNames.toArray.map(_.toString).sorted.toSeq ===
      Seq(".registry.lock.1", ".registry.lock.2"))
    // the stale lock was retired by the winner; everything released
    assert(!java.nio.file.Files.exists(stale))
    assert(!java.nio.file.Files.exists(fenced))
  }

  test("lease recovery: a crashed holder's lock is stolen; a live holder is waited out, then the wait times out loudly") {
    val src = fresh()
    VersionedTable.create(spark.range(4).toDF("id"), src)
    // crashed holder: a lock file whose mtime is older than the lease
    val clones = java.nio.file.Paths.get(src, "_clones")
    java.nio.file.Files.createDirectories(clones)
    val lock = clones.resolve(".registry.lock")
    java.nio.file.Files.write(lock,
      """{"owner":"dead","ts":0}""".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    VersionedTable.vacuum(src, 1, 0) // steals the stale lock, completes
    assert(!java.nio.file.Files.exists(lock), "lock released after the pass")
    // live holder: a waiter with a short budget fails LOUDLY, holder's
    // lock survives
    VersionedTable.withRegistryLock(src) {
      val e = intercept[IllegalStateException](
        VersionedTable.withRegistryLock(src, waitMs = 400) { fail("acquired") })
      assert(e.getMessage.contains("pin-registry lock"))
    }
    assert(!java.nio.file.Files.exists(lock))
  }
}
