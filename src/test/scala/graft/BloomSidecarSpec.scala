package graft

import graft.operators.Sketch
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Manifest-side point-lookup pruning (bloom sidecar) and metadata-only
  * aggregates (counts sidecar) for the versioned table. */
class BloomSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    java.nio.file.Files.createTempDirectory("graft_vtb").toString + "/t"

  // sidecar tamper tools speak the SAME Hadoop FileSystem the table
  // does (the local default is ChecksumFileSystem: editing bytes behind
  // its back would fail crc verification, and rightly so)
  private def hfs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())
  private def readText(p: String): String = {
    val in = hfs(p).open(new org.apache.hadoop.fs.Path(p))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
  private def writeText(p: String, s: String): Unit = {
    val out = hfs(p).create(new org.apache.hadoop.fs.Path(p), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }
  private def readBytes(p: String): Array[Byte] = {
    val fs = hfs(p)
    val hp = new org.apache.hadoop.fs.Path(p)
    val in = fs.open(hp)
    try {
      val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt)
      in.readFully(buf); buf
    } finally in.close()
  }
  private def writeBytes(p: String, b: Array[Byte]): Unit = {
    val out = hfs(p).create(new org.apache.hadoop.fs.Path(p), true)
    try out.write(b) finally out.close()
  }
  private def deleteFile(p: String): Unit =
    hfs(p).delete(new org.apache.hadoop.fs.Path(p), false)
  private def listDir(p: String): Seq[String] =
    hfs(p).listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filterNot(_.startsWith(".")).sorted.toSeq

  private def dataFiles(path: String, v: Long): Seq[String] =
    VersionedTable.filesAt(path, v)

  test("pinnedHashScala is bit-identical to the Column pinnedHash") {
    val samples = Seq("", "a", "item-42", "日本語テキスト", "x" * 300,
      "4611686018427387904", "-7")
    val viaColumn = samples.toDF("s")
      .select(col("s"), Sketch.pinnedHash(col("s"), "vtbloom-a:id").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(Sketch.pinnedHashScala(s, "vtbloom-a:id") === viaColumn(s), s)
    }
  }

  // a layout where range stats are USELESS for id lookups: ids
  // interleave across every file (hash-clustered on an unrelated key)
  private def interleavedTable(): (String, Long) = {
    val path = fresh()
    val df = spark.range(4000).select($"id", pmod($"id" * 2654435761L, lit(97L)).as("grp"))
      .repartition(8, $"grp")
    val v = VersionedTable.create(df, path)
    (path, v)
  }

  test("bloom sidecar: zero false negatives, real pruning, missing sidecar keeps all") {
    val (path, v) = interleavedTable()
    val all = dataFiles(path, v)
    assert(all.size === 8)
    // no sidecar yet: every probe keeps every file
    assert(VersionedTable.filesForKeys(path, v, "id", Seq("17")) === all)
    VersionedTable.writeBloom(spark, path, v, "id")
    // every present key: the pruned read returns exactly the full-scan rows
    val probes = Seq(0L, 1L, 17L, 1999L, 3999L).map(_.toString)
    val pruned = VersionedTable.readWhereKeys(spark, path, v, "id", probes)
      .select("id").as[Long].collect().sorted
    assert(pruned === Array(0L, 1L, 17L, 1999L, 3999L))
    // pruning is real: a single key survives far fewer than 8 files
    val survivors = VersionedTable.filesForKeys(path, v, "id", Seq("17"))
    assert(survivors.nonEmpty && survivors.size <= 2,
      s"expected <=2 of 8 files for one key, got ${survivors.size}")
    // absent keys prune everything (fpp ~0.05% at 16 bits/key)
    val absent = (100000L until 100050L).map(_.toString)
    val kept = VersionedTable.filesForKeys(path, v, "id", absent)
    assert(kept.size <= 1, s"absent keys kept ${kept.size} files")
    assert(VersionedTable.readWhereKeys(spark, path, v, "id", Seq("100001"))
      .count() === 0L)
  }

  test("bloom sidecar: an all-null file gets an explicit empty filter and prunes") {
    val path = fresh()
    val v0 = VersionedTable.create(
      spark.range(100).select($"id".as("k"), lit(1L).as("x")).coalesce(1), path)
    VersionedTable.commit(
      spark.range(5).select(lit(null).cast("long").as("k"), lit(2L).as("x"))
        .coalesce(1), path, "append")
    val v1 = VersionedTable.latestVersion(path).get
    VersionedTable.writeBloom(spark, path, v1, "k")
    // the null-only file cannot contain key "7": exactly one file survives
    assert(VersionedTable.filesForKeys(path, v1, "k", Seq("7")).size === 1)
    assert(VersionedTable.readWhereKeys(spark, path, v1, "k", Seq("7"))
      .select("k").as[Long].collect() === Array(7L))
  }

  test("bloom sidecar: refresh carries prior entries verbatim (O(commit))") {
    val path = fresh()
    val v0 = VersionedTable.create(
      spark.range(300).select($"id".as("k")).repartition(2), path)
    VersionedTable.writeBloom(spark, path, v0, "k")
    // corrupt a v0 word: a re-measure would regenerate the true bits;
    // a carry keeps the wound — proving old files never re-hash. The
    // shard is binary: flip one byte deep in a word payload and track
    // the 16-byte window around it (word payloads re-encode verbatim)
    val side = s"$path/_versions/" + f"v$v0%08d.bloom.k.d" + "/data.bin"
    val body = readBytes(side)
    val tampered = body.clone()
    val pos = tampered.length - 5
    tampered(pos) = (tampered(pos) ^ 0x55).toByte
    writeBytes(side, tampered)
    val v1 = VersionedTable.commit(
      spark.range(300, 400).select($"id".as("k")), path, "append")
    VersionedTable.writeBloom(spark, path, v1, "k")
    val v1body = readBytes(
      s"$path/_versions/" + f"v$v1%08d.bloom.k.d" + "/data.bin")
    val window = tampered.slice(pos - 8, pos + 8)
    def contains(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    assert(contains(v1body, window), "v1 refresh re-hashed carried files")
    // and the new file's keys are probe-able
    assert(VersionedTable.readWhereKeys(spark, path, v1, "k", Seq("350"))
      .count() === 1L)
  }

  test("readComposed: partition ∩ range ∩ bloom prunes multiply; rows exact") {
    val path = fresh()
    val df = spark.range(4000).select($"id",
      concat(lit("g"), pmod($"id", lit(4L))).as("p"),
      ($"id" % 1000L).as("ts"))
      .repartitionByRange(4, $"ts")
    val v = VersionedTable.createPartitioned(df, path, "p")
    VersionedTable.writeStats(spark, path, v, "ts")
    VersionedTable.writeBloom(spark, path, v, "id")
    val byPart = VersionedTable.filesForPartitions(path, v, "p", Seq("g1")).toSet
    val byRange = VersionedTable.filesForRange(path, v, "ts", 0L, 99L).toSet
    val byKey = VersionedTable.filesForKeys(path, v, "id", Seq("1001")).toSet
    val composed = byPart & byRange & byKey
    assert(composed.nonEmpty)
    assert(composed.size < byPart.size && composed.size < byRange.size,
      s"composition should out-prune each stage: ${composed.size} vs " +
        s"part=${byPart.size} range=${byRange.size} key=${byKey.size}")
    val got = VersionedTable.readComposed(spark, path, v,
      partitions = Some(("p", Seq("g1"))),
      ranges = Seq(("ts", 0L, 99L)),
      keys = Some(("id", Seq("1001"))))
      .select("id").as[Long].collect()
    assert(got === Array(1001L))
  }

  test("counts sidecar: exact countAt; refresh carries prior entries verbatim") {
    val path = fresh()
    val v0 = VersionedTable.create(spark.range(1000).toDF("id").repartition(4), path)
    assert(VersionedTable.countAt(path, v0) === None) // no sidecar yet
    VersionedTable.writeCounts(spark, path, v0)
    assert(VersionedTable.countAt(path, v0) === Some(1000L))
    val v1 = VersionedTable.commit(spark.range(1000, 1250).toDF("id"), path, "append")
    assert(VersionedTable.countAt(path, v1) === None) // v1 sidecar not written
    // tamper one v0 entry: if the v1 refresh re-measured old files the
    // tamper would vanish; carrying it proves the refresh is O(commit)
    val side = s"$path/_versions/" + f"v$v0%08d.counts.json"
    val body = readText(side)
    val tampered = body.replaceFirst(""""rows":(\d+)\}""", """"rows":999999}""")
    writeText(side, tampered)
    VersionedTable.writeCounts(spark, path, v1)
    val n1 = VersionedTable.countAt(path, v1).get
    assert(n1 != 1250L, "v1 refresh re-measured carried files (not O(commit))")
    assert(n1 === 1250L - body.replaceFirst("(?s).*?\"rows\":(\\d+)\\}.*", "$1").toLong + 999999L)
  }

  test("sum sidecar: exact sumAt / partitionSums; nulls sum to the 0 identity") {
    val path = fresh()
    val df = spark.range(600).select($"id",
      concat(lit("g"), pmod($"id", lit(2L))).as("p"),
      when(pmod($"id", lit(3L)) === 0, lit(null).cast("long"))
        .otherwise($"id").as("x"))
    val v = VersionedTable.createPartitioned(df, path, "p")
    assert(VersionedTable.sumAt(path, v, "x") === None) // no sidecar yet
    VersionedTable.writeSums(spark, path, v, "x")
    val total = (0L until 600L).filter(_ % 3 != 0).sum
    assert(VersionedTable.sumAt(path, v, "x") === Some(total))
    val parts = VersionedTable.partitionSums(path, v, "p", "x").get.toMap
    assert(parts("g0") ===
      (0L until 600L).filter(i => i % 2 == 0 && i % 3 != 0).sum)
    assert(parts("g1") === total - parts("g0"))
  }

  test("partitionStatsPanel: exact n/min/max/sum + p95 estimate at ZERO data I/O") {
    val path = fresh()
    val df = spark.range(3000).select($"id",
      concat(lit("g"), pmod($"id", lit(3L))).as("p"),
      ($"id" % 1000L).as("x"))
    val v = VersionedTable.createPartitioned(df, path, "p")
    assert(VersionedTable.partitionStatsPanel(spark, path, v, "p", "x") === None,
      "no moments sidecar yet: the panel must refuse, not guess")
    VersionedTable.writeMoments(spark, path, v, "x")
    val panel = VersionedTable.partitionStatsPanel(spark, path, v, "p", "x",
      qs = Seq(0.5, 0.95)).get.collect()
      .map(r => r.getString(0) -> r).toMap
    val expect = df.groupBy("p").agg(count(lit(1)).as("n"), min("x"), max("x"),
        sum("x"), graft.functions.InterpolatedQuantile.quantileCol($"x", 0.95).as("q95"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    expect.foreach { case (g, (n, lo, hi, sm, q95)) =>
      val r = panel(g)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)) ===
        ((n, lo, hi, sm.toString)), g)
      assert(math.abs(r.getDouble(5)) > 0) // mean present
      // the Cornish–Fisher estimate is an ESTIMATE: tolerance-gated
      assert(math.abs(r.getDouble(7) - q95) < 100.0, s"$g p95 ${r.getDouble(7)} vs $q95")
    }
    // zero data I/O, proven the hard way: drop every data file — the
    // panel answers identically from the manifest + sidecar alone
    hfs(path).delete(new org.apache.hadoop.fs.Path(s"$path/data"), true)
    val panel2 = VersionedTable.partitionStatsPanel(spark, path, v, "p", "x",
      qs = Seq(0.5, 0.95)).get.collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(panel2 === panel.map { case (k, r) => k -> r.toSeq })
  }

  test("moments sidecar: merged sketch == direct build; carry verbatim; quantile serves") {
    import graft.operators.Sketch
    val path = fresh()
    val df = spark.range(900).select($"id",
      concat(lit("g"), pmod($"id", lit(3L))).as("p"),
      when(pmod($"id", lit(7L)) === 0, lit(null).cast("long"))
        .otherwise(($"id" * 13L) % 500L).as("x"))
    val v0 = VersionedTable.createPartitioned(df, path, "p")
    assert(VersionedTable.momentsAt(path, v0, "x") === None) // no sidecar yet
    VersionedTable.writeMoments(spark, path, v0, "x")
    // metadata-only merge equals the direct global sketch
    val (n, lo, hi, ss) = VersionedTable.momentsAt(path, v0, "x").get
    val direct = Sketch.momentsSketch(df, Seq.empty, $"x").collect().head
    assert((n, lo, hi) === ((direct.getLong(0), direct.getLong(1),
      direct.getLong(2))))
    assert(ss.map(_.toString) === (3 to 6).map(direct.getString))
    // per-partition merge equals per-partition direct sketches
    val parts = VersionedTable.partitionMoments(path, v0, "p", "x").get.toMap
    val dParts = Sketch.momentsSketch(df, Seq("p"), $"x").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          (4 to 7).map(i => BigInt(r.getString(i))).toSeq))).toMap
    assert(parts === dParts)
    // the sidecar SERVES quantiles: p50 from the 7 scalars lands within
    // a quarter sd of the exact median on this near-uniform shape
    val est = Sketch.momentsQuantile(n, BigDecimal(ss(0)), BigDecimal(ss(1)),
      BigDecimal(ss(2)), BigDecimal(ss(3)), lo, hi, 0.5)
    val exact = df.filter($"x".isNotNull).stat
      .approxQuantile("x", Array(0.5), 0.0).head
    val sd = {
      val m = (BigDecimal(ss(0)) / n).toDouble
      math.sqrt((BigDecimal(ss(1)) / BigDecimal(n)).toDouble - m * m)
    }
    assert(math.abs(est - exact) <= 0.25 * sd, s"p50 est $est vs $exact (sd $sd)")
    // refresh carries prior entries verbatim (tamper survives = O(commit))
    val v1 = VersionedTable.commitPartitioned(
      spark.range(900, 1000).select($"id", lit("g0").as("p"),
        ($"id" % 11L).as("x")), path, "p", "append")
    val side = s"$path/_versions/" + f"v$v0%08d.moments.x.json"
    val body = readText(side)
    val tampered = body.replaceFirst(""""s1":"(-?\d+)"""", """"s1":"999999999"""")
    assert(tampered != body)
    writeText(side, tampered)
    VersionedTable.writeMoments(spark, path, v1, "x")
    val m1 = VersionedTable.momentsAt(path, v1, "x").get
    assert(m1._4(0) != ss(0) + (900L until 1000L).map(_ % 11L).sum,
      "v1 refresh re-measured carried files (not O(commit))")
  }

  test("ndv sidecar: per-file register merge equals the global HLL sketch") {
    val path = fresh()
    val df = spark.range(2000).select(($"id" % 700).cast("string").as("s"))
    val v0 = VersionedTable.create(df.repartition(4), path)
    assert(VersionedTable.ndvAt(path, v0, "s") === None) // no sidecar yet
    VersionedTable.writeNdv(spark, path, v0, "s", p = 6)
    val (raw, vz) = VersionedTable.ndvAt(path, v0, "s").get
    val g = graft.operators.Sketch
      .hllDistinct(df, col("s"), Seq.empty, p = 6, tag = "vtndv")
      .collect().head
    assert((raw, vz) === ((g.getLong(0), g.getLong(1))))
    // the estimate is sane for 700 distinct (raw regime at m=64)
    assert(raw > 400 && raw < 1100, s"raw=$raw")
  }

  test("partitionNdv: per-partition register merges equal per-group HLL sketches") {
    val path = fresh()
    val df = spark.range(3000).select(
      concat(lit("g"), pmod($"id", lit(3L))).as("p"),
      ($"id" % 800).cast("string").as("s"))
    val v = VersionedTable.createPartitioned(df.repartition(4), path, "p")
    VersionedTable.writeNdv(spark, path, v, "s", p = 6)
    val meta = VersionedTable.partitionNdv(path, v, "p", "s").get.toMap
    val direct = graft.operators.Sketch
      .hllDistinct(df, col("s"), Seq("p"), p = 6, tag = "vtndv")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(meta === direct)
  }

  test("ndv sidecar: refresh carries prior per-file registers verbatim") {
    val path = fresh()
    val v0 = VersionedTable.create(
      spark.range(500).select(($"id" % 300).cast("string").as("s")), path)
    VersionedTable.writeNdv(spark, path, v0, "s", p = 6)
    val v1 = VersionedTable.commit(
      spark.range(500, 700).select(($"id" % 450).cast("string").as("s")),
      path, "append")
    assert(VersionedTable.ndvAt(path, v1, "s") === None) // v1 not covered yet
    // tamper a v0 register: a re-measure would erase it; a carry keeps it
    val side = s"$path/_versions/" + f"v$v0%08d.ndv.s.json"
    val body = readText(side)
    val tampered = body.replaceFirst(""""regs":"(\d+):(\d+)""", "\"regs\":\"$1:41")
    writeText(side, tampered)
    VersionedTable.writeNdv(spark, path, v1, "s", p = 6)
    val v1body = readText(s"$path/_versions/" + f"v$v1%08d.ndv.s.json")
    assert(v1body.contains(":41"), "v1 refresh re-measured carried files")
  }

  test("property: readComposed equals the full-scan filter on seeded random predicates") {
    val path = fresh()
    val df = spark.range(3000).select($"id",
      concat(lit("g"), pmod($"id", lit(3L))).as("p"),
      pmod($"id" * 2654435761L, lit(500L)).as("ts"))
      .repartitionByRange(3, $"ts")
    val v = VersionedTable.createPartitioned(df, path, "p")
    VersionedTable.writeStats(spark, path, v, "ts")
    VersionedTable.writeBloom(spark, path, v, "id")
    val full = VersionedTable.readVersion(spark, path, v).cache()
    val rnd = new scala.util.Random(7)
    (0 until 12).foreach { _ =>
      val parts = (0 until 3).filter(_ => rnd.nextBoolean()).map(i => s"g$i")
      val lo = rnd.nextInt(500).toLong
      val hi = lo + rnd.nextInt(200)
      val keys = (0 until 1 + rnd.nextInt(4)).map(_ => rnd.nextInt(3500).toString)
      val useKeys = rnd.nextBoolean()
      val got = VersionedTable.readComposed(spark, path, v,
        partitions = if (parts.nonEmpty) Some(("p", parts)) else None,
        ranges = Seq(("ts", lo, hi)),
        keys = if (useKeys) Some(("id", keys)) else None)
        .select("id").as[Long].collect().sorted
      var expect = full.filter($"ts" >= lo && $"ts" <= hi)
      if (parts.nonEmpty) expect = expect.filter($"p".isin(parts: _*))
      if (useKeys) expect = expect.filter($"id".cast("string").isin(keys: _*))
      val want = expect.select("id").as[Long].collect().sorted
      assert(got === want, s"parts=$parts lo=$lo hi=$hi keys=$keys useKeys=$useKeys")
    }
    full.unpersist()
  }

  test("bloom shards align with partitions; scoped probes never read other shards") {
    val path = fresh()
    val df = spark.range(900).select($"id",
      concat(lit("g"), pmod($"id", lit(3L))).as("p"))
    val v = VersionedTable.createPartitioned(df, path, "p")
    VersionedTable.writeBloom(spark, path, v, "id")
    val dir = s"$path/_versions/" + f"v$v%08d.bloom.id.d"
    assert(listDir(dir) === Seq("p=g0.bin", "p=g1.bin", "p=g2.bin"))
    // scope candidates to ONE partition, then DELETE the other shards:
    // a scoped probe that touched them would now misbehave — it can't,
    // because it never reads them
    val cand = VersionedTable.filesForPartitions(path, v, "p", Seq("g1"))
    deleteFile(s"$dir/p=g0.bin")
    deleteFile(s"$dir/p=g2.bin")
    // id 7 is in g1 (7%3=1): exactly its file survives among candidates
    val hit = VersionedTable.filesForKeysAmong(path, v, "id", Seq("7"), cand)
    assert(hit.nonEmpty && hit.size < cand.size)
    // an absent key prunes all of g1's candidates
    assert(VersionedTable.filesForKeysAmong(path, v, "id",
      Seq("123456789"), cand).isEmpty)
  }

  test("vacuum sweeps a dropped version's sidecars (all five families)") {
    val path = fresh()
    val v0 = VersionedTable.create(spark.range(50).select($"id".as("k")), path)
    VersionedTable.writeStats(spark, path, v0, "k")
    VersionedTable.writeCounts(spark, path, v0)
    VersionedTable.writeSums(spark, path, v0, "k")
    VersionedTable.writeNdv(spark, path, v0, "k")
    VersionedTable.writeBloom(spark, path, v0, "k")
    VersionedTable.commit(spark.range(50, 60).select($"id".as("k")), path, "append")
    VersionedTable.vacuum(path, keepVersions = 1, minAgeMs = 0)
    val leftover = new java.io.File(path, "_versions").listFiles()
      .map(_.getName).filter(_.startsWith(f"v$v0%08d."))
    assert(leftover.isEmpty, s"leaked sidecars: ${leftover.mkString(", ")}")
    // the kept version still reads
    assert(VersionedTable.read(spark, path).count() === 60L)
  }

  test("partitionRowCounts: metadata-only GROUP BY partition matches the data") {
    val path = fresh()
    val df = spark.range(900).select($"id",
      concat(lit("g"), pmod($"id", lit(3L))).as("p"))
    val v = VersionedTable.createPartitioned(df, path, "p")
    VersionedTable.writeCounts(spark, path, v)
    val meta = VersionedTable.partitionRowCounts(path, v, "p").get
    assert(meta === Seq("g0" -> 300L, "g1" -> 300L, "g2" -> 300L))
    // flat layout: refuses rather than inventing a partition
    val flat = fresh()
    val fv = VersionedTable.create(spark.range(10).toDF("id"), flat)
    VersionedTable.writeCounts(spark, flat, fv)
    intercept[IllegalArgumentException] {
      VersionedTable.partitionRowCounts(flat, fv, "p")
    }
  }
}
