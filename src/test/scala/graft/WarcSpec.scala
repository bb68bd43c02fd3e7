package graft

import graft.expr.BinaryExpressions
import graft.sources.WarcIO
import org.apache.spark.sql.functions._

/** WARC container format: strict parse of hand-built bytes, roundtrips
  * (plain / gzip members / sharded), loud corruption errors, and the
  * single-parse HTTP response splitter. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(suffix: String) =
    java.nio.file.Files.createTempDirectory("graft_warc").toString + suffix

  private val httpPayload =
    ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "Server: x\r\n\r\n" +
      "<html>hello</html>").getBytes("UTF-8")

  test("hand-built WARC/1.0 bytes parse to exact fields (format literal)") {
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\n" +
      "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
      "WARC-Target-URI: http://example.com/a\r\n" +
      "WARC-IP-Address: 10.0.0.1\r\n" + // extension field: skipped, legal
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpPayload.length}\r\n" +
      "\r\n").getBytes("UTF-8") ++ httpPayload ++ "\r\n\r\n".getBytes("UTF-8")
    val rs = WarcIO.records(raw).toSeq
    assert(rs.size === 1)
    val r = rs.head
    assert(r.warcType === "response")
    assert(r.recordId === "<urn:x:1>")
    assert(r.date === "2026-01-02T03:04:05Z")
    assert(r.targetUri === Some("http://example.com/a"))
    assert(r.contentType === "application/http; msgtype=response")
    assert(r.payload === httpPayload)
  }

  test("revisit records: WARC-Refers-To roundtrips; absent field is None") {
    val canon = WarcIO.recordBytes("response", "2026-01-01T00:00:00Z",
      Some("http://e/a"), "application/http; msgtype=response", httpPayload,
      recordId = Some("<urn:doc:1>"))
    val revisit = WarcIO.recordBytes("revisit", "2026-01-02T00:00:00Z",
      Some("http://e/a"), "application/octet-stream", Array.empty[Byte],
      recordId = Some("<urn:doc:2>"), refersTo = Some("<urn:doc:1>"))
    val rs = WarcIO.records(canon ++ revisit).toSeq
    assert(rs.map(_.refersTo) === Seq(None, Some("<urn:doc:1>")))
    assert(rs(1).warcType === "revisit")
    assert(rs(1).payload.isEmpty)
  }

  test("parse strictness: missing Content-Length / bad terminator are loud") {
    val noLen = ("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <a>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n\r\n").getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException](WarcIO.records(noLen).toSeq)
    assert(e1.getMessage.contains("Content-Length"))
    val good = WarcIO.recordBytes("resource", "2026-01-01T00:00:00Z",
      Some("http://e/x"), "text/plain", "abc".getBytes)
    val badTerm = good.dropRight(4) ++ "XXXX".getBytes
    val e2 = intercept[IllegalArgumentException](WarcIO.records(badTerm).toSeq)
    assert(e2.getMessage.contains("CRLFCRLF"))
  }

  private def docsDf = Seq(
    (0L, "http://e/0", "<html>zero</html>"),
    (1L, "http://e/1", "<html>one</html>"),
    (2L, "http://e/2", "<html>two</html>")
  ).toDF("doc_id", "target_uri", "html")
    .select(col("doc_id"), col("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        col("html")).cast("binary").as("payload"))

  test("roundtrip: plain file and gzip members; warcinfo leads") {
    for (ext <- Seq("/d.warc", "/d.warc.gz")) {
      val path = fresh(ext)
      WarcIO.write(docsDf, path)
      val back = WarcIO.read(spark, path).orderBy(col("record_id"))
      assert(back.filter(col("warc_type") === "warcinfo").count() === 1)
      val resp = back.filter(col("warc_type") === "response")
        .select(col("target_uri"), col("payload").cast("string"))
        .as[(String, String)].collect().sortBy(_._1)
      assert(resp.map(_._1).toSeq === Seq("http://e/0", "http://e/1", "http://e/2"))
      assert(resp.forall(_._2.endsWith("</html>")))
      // deterministic record ids: writing again produces identical bytes
      val p2 = fresh(ext)
      WarcIO.write(docsDf, p2)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))))
    }
  }

  test("multi-member gzip: corrupt boundary and truncation are loud errors") {
    val path = fresh("/d.warc.gz")
    WarcIO.write(docsDf, path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // locate the second member (1F 8B after offset 0) and wound it
    var second = 1
    while (!((bytes(second) & 0xFF) == 0x1F && (bytes(second + 1) & 0xFF) == 0x8B))
      second += 1
    val garbage = bytes.take(second) ++ Array[Byte]('X') ++ bytes.drop(second)
    val e1 = intercept[IllegalArgumentException](WarcIO.gunzipAll(garbage))
    assert(e1.getMessage.contains("gzip"))
    val truncated = bytes.dropRight(6)
    intercept[IllegalArgumentException](WarcIO.gunzipAll(truncated))
    // and the undamaged buffer still decodes to parseable records
    assert(WarcIO.records(WarcIO.gunzipAll(bytes)).size === 4)
  }

  test("property: arbitrary binary payloads roundtrip byte-exact (incl. framing traps)") {
    // Content-Length framing means payload bytes are NEVER scanned for
    // delimiters — a payload containing a fake record header or CRLFCRLF
    // must come back untouched. 50 seeded-random buffers + the trap.
    val rnd = new scala.util.Random(42)
    val payloads = (0 until 50).map { _ =>
      val b = new Array[Byte](rnd.nextInt(2000)); rnd.nextBytes(b); b
    } :+ "\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n".getBytes("UTF-8")
    val recs = payloads.zipWithIndex.map { case (p, i) =>
      WarcIO.recordBytes("resource", "2026-01-01T00:00:00Z",
        Some(s"http://e/$i"), "application/octet-stream", p)
    }
    val back = WarcIO.records(recs.reduce(_ ++ _)).toSeq
    assert(back.size === payloads.size)
    back.zip(payloads).foreach { case (r, p) =>
      assert(java.util.Arrays.equals(r.payload, p)) }
    // and through per-record gzip members
    val back2 = WarcIO.records(
      WarcIO.gunzipAll(recs.map(WarcIO.gzipMember).reduce(_ ++ _))).toSeq
    assert(back2.size === payloads.size)
    back2.zip(payloads).foreach { case (r, p) =>
      assert(java.util.Arrays.equals(r.payload, p)) }
  }

  test("gunzipAll rejects a zip bomb at the expansion ceiling, not at OOM") {
    // 16 MiB of zeros compresses to ~16 KB; a 1 MiB ceiling must refuse
    val bomb = WarcIO.gzipMember(new Array[Byte](16 * 1024 * 1024))
    assert(bomb.length < 64 * 1024)
    val e = intercept[IllegalArgumentException] {
      WarcIO.gunzipAll(bomb, maxExpandedBytes = 1024 * 1024)
    }
    assert(e.getMessage.contains("zip bomb"))
    // under the ceiling it decodes fine
    assert(WarcIO.gunzipAll(bomb).length === 16 * 1024 * 1024)
  }

  test("streaming source throttle: maxVersionsPerBatch paces catch-up") {
    import graft.sources.VersionedTable
    val tbl = fresh("/t")
    VersionedTable.create(spark.range(3).toDF("id"), tbl)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("org.apache.spark.sql.graftx.VersionedTableStreamProvider")
      .option("path", tbl).option("maxVersionsPerBatch", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        batches.synchronized { batches += b.count() }
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable() // the snapshot batch
      // a 4-version backlog accumulates while the stream idles; the
      // throttle must deliver it one version per micro-batch
      (1 to 4).foreach(i =>
        VersionedTable.commit(spark.range(i * 10, i * 10 + 2).toDF("id"),
          tbl, "append"))
      q.processAllAvailable()
    } finally q.stop()
    assert(batches.sum === 3L + 4 * 2)
    assert(batches.count(_ == 2L) === 4,
      s"expected 4 throttled single-version batches, got $batches")
  }

  test("writeSharded: deterministic shard files, distributed read-back equals input") {
    val df = spark.range(40).select(col("id").as("doc_id"),
      concat(lit("http://e/"), col("id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("HTTP/1.1 200 OK\r\n\r\nbody-"), col("id"))
        .cast("binary").as("payload"))
    val dir = fresh("/shards")
    val n = WarcIO.writeSharded(df, dir, "doc_id", 4)
    assert(n === 4)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(names === (0 until 4).map(i => f"part-$i%05d.warc.gz").toArray)
    val back = WarcIO.read(spark, dir + "/*.warc.gz")
      .filter(col("warc_type") === "response")
    assert(back.count() === 40)
    assert(back.select(col("target_uri")).distinct().count() === 40)
  }

  test("end-to-end: WARC shards stream exactly-once into the table, metadata current") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.VersionedTable
    // three .warc.gz shards on disk = the arriving crawl
    val dir = fresh("/crawl")
    WarcIO.writeSharded(spark.range(30).select(col("id").as("doc_id"),
      concat(lit("http://e/"), col("id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("HTTP/1.1 200 OK\r\n\r\nd"), col("id"))
        .cast("binary").as("payload")), dir, "doc_id", 3)
    val shards = new java.io.File(dir).listFiles().map(_.getAbsolutePath).sorted
    val table = fresh("/t")
    VersionedTable.create(
      spark.range(0).select(col("id").as("doc_id"), lit("").as("text")), table)
    // shard paths arrive as a stream; each micro-batch reads its shards,
    // splits HTTP, commits exactly-once, and refreshes the counts
    // sidecar in O(batch) — the dashboard is current at every commit
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = input.toDF.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val paths = batch.collect().map(_.getString(0))
        if (paths.nonEmpty) {
          val docs = WarcIO.read(spark, paths.mkString(","))
            .filter(col("warc_type") === "response")
            .select(
              regexp_extract(col("target_uri"), "/(\\d+)$", 1)
                .cast("long").as("doc_id"),
              graft.expr.BinaryExpressions.httpResponse(col("payload"))
                .getField("body").cast("string").as("text"))
          VersionedTable.commitStreamBatch(docs, table, "crawl", bid)
            .foreach(v => VersionedTable.writeCounts(spark, table, v))
        }
        (): Unit
      }
      .start()
    try {
      input.addData(shards(0)); q.processAllAvailable()
      input.addData(shards(1), shards(2)); q.processAllAvailable()
    } finally q.stop()
    val latest = VersionedTable.latestVersion(table).get
    assert(VersionedTable.countAt(table, latest) === Some(30L))
    // crash-replay: a re-delivered batch is a no-op, metadata unchanged
    assert(VersionedTable.commitStreamBatch(
      VersionedTable.read(spark, table), table, "crawl", 0L).isEmpty)
    assert(VersionedTable.countAt(table, latest) === Some(30L))
    val got = VersionedTable.read(spark, table)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 30L))
    assert(got.forall { case (id, text) => text == s"d$id" })
  }

  test("httpResponse: single-parse status / content-type / body; null non-HTTP") {
    val rows = Seq(
      ("ok", httpPayload),
      ("nohdr", "HTTP/1.0 404 Not Found\r\n\r\n".getBytes("UTF-8")),
      ("lowercase", ("HTTP/1.1 301 Moved\r\ncontent-type: a/b\r\n\r\nX").getBytes("UTF-8")),
      ("nothttp", "<html>not an http message</html>".getBytes("UTF-8")),
      ("short", Array[Byte](1, 2, 3))
    ).toDF("k", "payload")
      .select(col("k"), BinaryExpressions.httpResponse(col("payload")).as("h"))
      .select(col("k"), col("h.status").as("s"), col("h.content_type").as("ct"),
        col("h.body").cast("string").as("b"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) null else r.getInt(1), r.getString(2), r.getString(3))))
      .toMap
    assert(rows("ok") === ((200, "text/html; charset=utf-8", "<html>hello</html>")))
    assert(rows("nohdr") === ((404, null, "")))
    assert(rows("lowercase") === ((301, "a/b", "X")))
    assert(rows("nothttp") === ((null, null, null)))
    assert(rows("short") === ((null, null, null)))
  }
}
