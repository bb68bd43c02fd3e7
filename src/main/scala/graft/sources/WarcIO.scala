package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.{BufferedOutputStream, File, FileOutputStream}

/** WARC (Web ARChive, ISO 28500) IO — the container every web-scale
  * training corpus starts from (Common Crawl publishes crawl data as
  * `.warc.gz`). Hand-rolled on the PUBLIC format alone: a WARC file is
  * a sequence of records, each
  *
  * ```
  * WARC/1.0\r\n
  * WARC-Type: response\r\n           (named fields, order free)
  * WARC-Record-ID: <urn:...>\r\n
  * WARC-Date: 2026-01-01T00:00:00Z\r\n
  * WARC-Target-URI: http://...\r\n
  * Content-Type: application/http; msgtype=response\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N content bytes>\r\n\r\n
  * ```
  *
  * and a `.warc.gz` is one gzip MEMBER per record, members concatenated
  * — the layout that lets a crawler index byte-offsets and a reader
  * decode records independently. Reads verify structure strictly: a
  * missing Content-Length, a truncated content block, or a malformed
  * record terminator is an error, not silent truncation — and the
  * multi-member gunzip requires every input byte to be consumed, so a
  * corrupt member boundary cannot silently drop the tail of a shard
  * (GZIPInputStream treats "next bytes are not a gzip header" as EOF).
  *
  * Role split mirrors [[TFRecordIO]]: the single-file WRITER is a
  * guarded driver-side exchange path; [[writeSharded]] is the
  * DISTRIBUTED production writer (deterministic shard-by-fingerprint,
  * executors stream records through the Hadoop FS API); the READER is
  * distributed — one task per file via binaryFiles (a WARC is never
  * split mid-record; CC-sized ~1 GiB shards are the unit of
  * parallelism at 100 TB, and small shards combine).
  *
  * Reference scope note: the reference engine has no web-archive
  * surface; this is part of the beyond-reference training-data layer.
  */
object WarcIO {

  val DefaultMaxRows: Long = 1L * 1000 * 1000

  /** One parsed WARC record: the six headers every pipeline consumes
    * plus the raw content block. Unrecognized named fields are allowed
    * and skipped on read (the spec permits extension fields). */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      date: String,
      targetUri: Option[String],
      contentType: String,
      payload: Array[Byte],
      refersTo: Option[String] = None)

  // ---- record encode ----

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Encode one record. `recordId` defaults to a DETERMINISTIC urn
    * derived from the pinned fingerprint of (type, uri, date) — same
    * input, same bytes, so exports compose with shard-manifest
    * verification the way TFRecord shards do. */
  def recordBytes(warcType: String, date: String, targetUri: Option[String],
      contentType: String, payload: Array[Byte],
      recordId: Option[String] = None,
      refersTo: Option[String] = None): Array[Byte] = {
    val id = recordId.getOrElse {
      val key = s"$warcType:${targetUri.getOrElse("")}:$date"
      f"<urn:graft:${graft.operators.Sketch.pinnedHashScala(key, "warcid")}%016x>"
    }
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: $id\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    refersTo.foreach(r => sb.append(s"WARC-Refers-To: $r\r\n"))
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.result().getBytes("UTF-8")
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    System.arraycopy(Crlf, 0, out, head.length + payload.length, 2)
    System.arraycopy(Crlf, 0, out, head.length + payload.length + 2, 2)
    out
  }

  /** The leading warcinfo record every conformant WARC file opens with. */
  def warcinfoBytes(date: String): Array[Byte] = {
    val body = "software: graft\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    recordBytes("warcinfo", date, None, "application/warc-fields", body)
  }

  // ---- record parse ----

  /** Iterate the records of a (decompressed) WARC buffer, strictly:
    * version line, named fields, Content-Length content block, CRLFCRLF
    * terminator. Malformed structure is an error with the byte offset. */
  def records(b: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var i = 0
    def hasNext: Boolean = i < b.length
    def next(): WarcRecord = {
      val start = i
      def lineEnd(from: Int): Int = {
        var j = from
        while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
        require(j + 1 < b.length, s"WARC: unterminated header line at $from")
        j
      }
      val ve = lineEnd(i)
      val version = new String(b, i, ve - i, "UTF-8")
      require(version.startsWith("WARC/"),
        s"WARC: expected version line at $start, got '${version.take(20)}'")
      i = ve + 2
      var warcType: String = null; var recordId: String = null
      var date: String = null; var uri: Option[String] = None
      var contentType: String = ""; var contentLength = -1L
      var refersTo: Option[String] = None
      while (!(i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n')) {
        val he = lineEnd(i)
        val line = new String(b, i, he - i, "UTF-8")
        val sep = line.indexOf(':')
        require(sep > 0, s"WARC: malformed header '$line' at $i")
        val name = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-record-id" => recordId = value
          case "warc-date" => date = value
          case "warc-target-uri" => uri = Some(value)
          case "warc-refers-to" => refersTo = Some(value)
          case "content-type" => contentType = value
          case "content-length" => contentLength = value.toLong
          case _ => () // extension fields are legal; skip
        }
        i = he + 2
      }
      i += 2 // the blank line ending the header block
      require(contentLength >= 0, s"WARC: record at $start has no Content-Length")
      require(warcType != null && recordId != null && date != null,
        s"WARC: record at $start is missing a mandatory field")
      require(i + contentLength + 4 <= b.length,
        s"WARC: record at $start declares $contentLength content bytes beyond the buffer")
      val payload = java.util.Arrays.copyOfRange(b, i, i + contentLength.toInt)
      i += contentLength.toInt
      require(b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n',
        s"WARC: record at $start lacks the CRLFCRLF terminator")
      i += 4
      WarcRecord(warcType, recordId, date, uri, contentType, payload, refersTo)
    }
  }

  // ---- gzip members ----

  /** Gzip one buffer as a single member. */
  def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Decompress a whole buffer of CONCATENATED gzip members with a
    * strict manual member walk: GZIPInputStream treats a corrupt
    * next-member header as EOF and silently drops the tail of the
    * shard — the one failure mode a 100 TB ingest cannot afford. Here
    * every input byte must belong to a well-formed member (RFC 1952
    * header, raw-deflate body, CRC32 + ISIZE trailer, both VERIFIED)
    * or the read is a loud error with the byte offset. */
  /** Expansion ceiling for [[gunzipAll]]: decompression output beyond
    * this is a loud error, not an OOM — a hostile shard can pack a
    * multi-GB expansion into a few KB (the classic zip bomb), and an
    * unattended 100 TB ingest must reject it, not die on it. */
  val MaxExpandedBytes: Long = 8L * 1024 * 1024 * 1024

  def gunzipAll(b: Array[Byte],
      maxExpandedBytes: Long = MaxExpandedBytes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4L, 1L << 20).toInt)
    var expanded = 0L
    def le32(i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    var off = 0
    while (off < b.length) {
      require(b.length - off >= 18 && (b(off) & 0xFF) == 0x1F &&
        (b(off + 1) & 0xFF) == 0x8B,
        s"WARC: not a gzip member header at byte $off")
      require(b(off + 2) == 8, s"WARC: unsupported gzip method at $off")
      val flg = b(off + 3) & 0xFF
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8); p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, p, b.length - p)
      val buf = new Array[Byte](65536)
      val crc = new java.util.zip.CRC32()
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !inf.needsInput(),
          s"WARC: truncated gzip member at $off")
        out.write(buf, 0, n); crc.update(buf, 0, n); total += n
        expanded += n
        require(expanded <= maxExpandedBytes,
          s"WARC: gzip expansion exceeds $maxExpandedBytes bytes at member $off " +
            "(zip bomb?)")
      }
      val end = p + inf.getBytesRead.toInt
      inf.end()
      require(b.length - end >= 8, s"WARC: gzip member at $off lacks its trailer")
      require(le32(end) == crc.getValue,
        s"WARC: gzip member at $off fails its CRC32")
      require(le32(end + 4) == (total & 0xFFFFFFFFL),
        s"WARC: gzip member at $off fails its ISIZE check")
      off = end + 8
    }
    out.toByteArray
  }

  // ---- readers / writers ----

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("refers_to", StringType, nullable = true)))

  /** Distributed reader over a file or directory of WARC shards: one
    * task per file via binaryFiles. `.gz` files decode as concatenated
    * per-record members (the Common Crawl layout) or whole-file gzip —
    * both are just "members" to [[gunzipAll]]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, stream) =>
        val raw = stream.toArray()
        val bytes = if (file.endsWith(".gz")) gunzipAll(raw) else raw
        records(bytes).map(r => Row(r.warcType, r.recordId, r.date,
          r.targetUri.orNull, r.contentType, r.payload.length.toLong, r.payload,
          r.refersTo.orNull))
      }
    spark.createDataFrame(rdd, schema)
  }

  private def rowRecord(schema: StructType, r: Row): Array[Byte] = {
    def opt(name: String): Option[String] = {
      val i = schema.fieldNames.indexOf(name)
      if (i < 0 || r.isNullAt(i)) None else Some(r.getString(i))
    }
    val uri = opt("target_uri")
    val warcType = opt("warc_type").getOrElse("response")
    val contentType = opt("content_type").getOrElse(
      if (warcType == "response") "application/http; msgtype=response"
      else "application/octet-stream")
    val date = opt("warc_date").getOrElse(
      throw new IllegalArgumentException("WarcIO.write: warc_date column is required"))
    val pi = schema.fieldNames.indexOf("payload")
    require(pi >= 0, "WarcIO.write: payload column is required")
    recordBytes(warcType, date, uri, contentType, r.getAs[Array[Byte]](pi),
      opt("record_id"), opt("refers_to"))
  }

  /** Driver-side guarded writer — one WARC file (gzip members when the
    * path ends .gz), warcinfo first. Same contract as TFRecordIO.write:
    * the production path is [[writeSharded]]. */
  def write(df: DataFrame, path: String, maxRows: Long = DefaultMaxRows): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"WarcIO.write: $n rows exceeds the $maxRows-row exchange-path guard")
    val gz = path.endsWith(".gz")
    val sch = df.schema
    val rows = df.collect()
    val date = rows.headOption.flatMap { r =>
      val i = sch.fieldNames.indexOf("warc_date")
      if (i >= 0 && !r.isNullAt(i)) Some(r.getString(i)) else None
    }.getOrElse("1970-01-01T00:00:00Z")
    val out = new File(path)
    Option(out.getParentFile).foreach(_.mkdirs())
    val os = new BufferedOutputStream(new FileOutputStream(out))
    def emit(rec: Array[Byte]): Unit = {
      val b = if (gz) gzipMember(rec) else rec
      os.write(b, 0, b.length)
    }
    try {
      emit(warcinfoBytes(date))
      rows.foreach(r => emit(rowRecord(sch, r)))
    } finally os.close()
  }

  /** DISTRIBUTED sharded export — shard by the pinned fingerprint of
    * `idCol`, colocate and sort within the shard, each executor streams
    * its shards' records (gzip member per record when codec=gzip)
    * through the Hadoop FS API. Deterministic at byte level, like
    * [[TFRecordIO.writeSharded]]. Returns the shard count. */
  def writeSharded(df: DataFrame, dir: String, idCol: String,
      nShards: Int, codec: String = "gzip"): Int = {
    require(nShards >= 1, "WarcIO.writeSharded: nShards must be >= 1")
    require(codec == "none" || codec == "gzip",
      s"WarcIO.writeSharded: codec must be none|gzip, got $codec")
    val gz = codec == "gzip"
    val sch = df.schema
    df.withColumn("__shard", graft.operators.Sampling.shardOf(col(idCol), nShards))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(idCol))
      .foreachPartition { rows: Iterator[Row] =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
        fs.setWriteChecksum(false)
        var current = -1L
        var out: java.io.OutputStream = null
        val shardIdx = sch.length
        try {
          rows.foreach { r =>
            val shard = r.getLong(shardIdx)
            if (shard != current) {
              if (out != null) out.close()
              val name =
                if (gz) f"part-$shard%05d.warc.gz" else f"part-$shard%05d.warc"
              out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
              val date = {
                val i = sch.fieldNames.indexOf("warc_date")
                if (i >= 0 && !r.isNullAt(i)) r.getString(i)
                else "1970-01-01T00:00:00Z"
              }
              val info = warcinfoBytes(date)
              val ib = if (gz) gzipMember(info) else info
              out.write(ib, 0, ib.length)
              current = shard
            }
            val rec = rowRecord(sch, Row.fromSeq(r.toSeq.dropRight(1)))
            val b = if (gz) gzipMember(rec) else rec
            out.write(b, 0, b.length)
          }
        } finally if (out != null) out.close()
      }
    nShards
  }
}
