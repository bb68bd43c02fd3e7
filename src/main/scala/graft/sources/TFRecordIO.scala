package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.{BufferedOutputStream, File, FileOutputStream}

/** TFRecord / tf.Example IO — the standard handoff artifact from a
  * training-data pipeline to a trainer (`tf.data.TFRecordDataset`),
  * hand-rolled on the PUBLIC specs alone: the TFRecord framing
  * (TensorFlow `tensorflow/core/lib/io/record_writer`: u64-LE length,
  * masked-CRC32C of the length bytes, payload, masked-CRC32C of the
  * payload; mask = rotr15(crc)+0xa282ead8) and the protobuf wire format
  * for `tf.train.Example` (Example{1: Features}, Features{1: map<string,
  * Feature>}, Feature oneof {1: BytesList, 2: FloatList, 3: Int64List},
  * each list a repeated field 1). CRC32C is `java.util.zip.CRC32C`
  * (JDK 9+, zero deps).
  *
  * Role split mirrors [[AvroIO]]/[[FeatherV1]]: the file WRITER is a
  * guarded driver-side exchange path (one .tfrecord file; production
  * flows use the distributed [[toExampleBytes]] encoder and write
  * shards through the layout machinery), the READER is DISTRIBUTED —
  * one task per file via binaryFiles (small shards combine; a record
  * stream is never split mid-frame). Both CRCs are VERIFIED on read —
  * a corrupt frame is an error, not silent garbage in a training run.
  *
  * tf.Example is schema-on-read: the container carries no types, so
  * [[read]] takes the Spark schema to decode against (the same contract
  * TensorFlow's `parse_example` has with its feature spec). Supported
  * field types, the standard tf.Example mapping:
  * long/int/boolean → int64_list, float → float_list, string/binary →
  * bytes_list, and their array forms (embedding vectors ride
  * float_list). Doubles are NOT supported — tf.Example has no double
  * list; cast to float explicitly if lossy export is intended. NULL
  * values travel as ABSENT features (the tf.Example convention);
  * absent-on-read decodes to null.
  */
object TFRecordIO {

  val DefaultMaxRows: Long = 5L * 1000 * 1000

  // ---- TFRecord framing ----

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt // low 32 bits
    (Integer.rotateRight(crc, 15) + 0xa282ead8) // u32 wrap-around add
  }

  private def le32(v: Int): Array[Byte] = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def le64(v: Long): Array[Byte] = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte,
    (v >> 32).toByte, (v >> 40).toByte, (v >> 48).toByte, (v >> 56).toByte)

  private def readLe32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  private def readLe64(b: Array[Byte], i: Int): Long =
    (readLe32(b, i).toLong & 0xFFFFFFFFL) | (readLe32(b, i + 4).toLong << 32)

  /** One framed record: length, masked crc(length), data, masked crc(data). */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val len = le64(payload.length.toLong)
    len ++ le32(maskedCrc(len, 0, 8)) ++ payload ++
      le32(maskedCrc(payload, 0, payload.length))
  }

  /** Iterate the framed records of a buffer, verifying both CRCs. */
  def frames(b: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var i = 0
    def hasNext: Boolean = i < b.length
    def next(): Array[Byte] = {
      require(i + 12 <= b.length, s"TFRecord: truncated frame header at $i")
      val len = readLe64(b, i)
      require(len >= 0 && i + 12 + len + 4 <= b.length,
        s"TFRecord: frame at $i declares $len bytes beyond the buffer")
      require(readLe32(b, i + 8) == maskedCrc(b, i, 8),
        s"TFRecord: length CRC mismatch at $i")
      val data = java.util.Arrays.copyOfRange(b, i + 12, i + 12 + len.toInt)
      require(readLe32(b, i + 12 + len.toInt) == maskedCrc(data, 0, data.length),
        s"TFRecord: data CRC mismatch at $i")
      i += 12 + len.toInt + 4
      data
    }
  }

  // ---- minimal protobuf wire helpers ----

  private final class ProtoOut {
    private val buf = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { buf.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint(((field << 3) | wire).toLong)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
    }
    def fixed32(v: Int): Unit = buf.write(le32(v), 0, 4)
    def toBytes: Array[Byte] = buf.toByteArray
  }

  private final class ProtoIn(b: Array[Byte], from: Int, to: Int) {
    private var i = from
    def hasMore: Boolean = i < to
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(i < to, "TFRecord: truncated varint")
        val x = b(i); i += 1
        out |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "TFRecord: varint too long")
      }
      out // unreachable
    }
    def fixed32(): Int = {
      require(i + 4 <= to, "TFRecord: truncated fixed32")
      val v = readLe32(b, i); i += 4; v
    }
    /** Read a tag; returns (field, wire). */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    /** Bounds of a length-delimited field; advances past it. */
    def delimited(): (Int, Int) = {
      val len = varint().toInt
      require(len >= 0 && i + len <= to, "TFRecord: truncated delimited field")
      val r = (i, i + len); i += len; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(): Unit
      case 1 => require(i + 8 <= to, "TFRecord: truncated fixed64"); i += 8
      case 2 => delimited(): Unit
      case 5 => require(i + 4 <= to, "TFRecord: truncated fixed32"); i += 4
      case other => throw new IllegalArgumentException(s"TFRecord: wire type $other")
    }
  }

  // ---- tf.Example encode ----

  private def featureBytes(dt: DataType, v: Any): Array[Byte] = {
    val f = new ProtoOut
    def int64List(vals: scala.collection.Seq[Long]): Unit = {
      val l = new ProtoOut
      // packed repeated int64 (field 1, wire 2)
      val packed = new ProtoOut
      vals.foreach(packed.varint)
      l.bytesField(1, packed.toBytes)
      f.bytesField(3, l.toBytes) // Feature.int64_list = 3
    }
    def floatList(vals: scala.collection.Seq[Float]): Unit = {
      val l = new ProtoOut
      val packed = new ProtoOut
      vals.foreach(x => packed.fixed32(java.lang.Float.floatToIntBits(x)))
      l.bytesField(1, packed.toBytes)
      f.bytesField(2, l.toBytes) // Feature.float_list = 2
    }
    def bytesList(vals: scala.collection.Seq[Array[Byte]]): Unit = {
      val l = new ProtoOut
      vals.foreach(b => l.bytesField(1, b)) // bytes are never packed
      f.bytesField(1, l.toBytes) // Feature.bytes_list = 1
    }
    dt match {
      case LongType => int64List(Seq(v.asInstanceOf[Long]))
      case IntegerType => int64List(Seq(v.asInstanceOf[Int].toLong))
      case BooleanType => int64List(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L))
      case FloatType => floatList(Seq(v.asInstanceOf[Float]))
      case StringType => bytesList(Seq(v.asInstanceOf[String].getBytes("UTF-8")))
      case BinaryType => bytesList(Seq(v.asInstanceOf[Array[Byte]]))
      case ArrayType(LongType, _) =>
        int64List(v.asInstanceOf[scala.collection.Seq[Long]])
      case ArrayType(IntegerType, _) =>
        int64List(v.asInstanceOf[scala.collection.Seq[Int]].map(_.toLong))
      case ArrayType(FloatType, _) =>
        floatList(v.asInstanceOf[scala.collection.Seq[Float]])
      case ArrayType(StringType, _) =>
        bytesList(v.asInstanceOf[scala.collection.Seq[String]].map(_.getBytes("UTF-8")))
      case other => throw new IllegalArgumentException(
        s"TFRecordIO: unsupported Spark type $other (tf.Example carries " +
          "int64/float/bytes lists; cast doubles to float explicitly)")
    }
    f.toBytes
  }

  /** Serialize one Row to tf.Example bytes. Null fields are OMITTED (the
    * tf.Example convention for missing features). */
  def exampleBytes(schema: StructType, row: Row): Array[Byte] = {
    val features = new ProtoOut
    schema.fields.zipWithIndex.foreach { case (sf, i) =>
      if (!row.isNullAt(i)) {
        val entry = new ProtoOut // map entry {1: key, 2: Feature}
        entry.bytesField(1, sf.name.getBytes("UTF-8"))
        entry.bytesField(2, featureBytes(sf.dataType, row.get(i)))
        features.bytesField(1, entry.toBytes) // Features.feature = 1
      }
    }
    val example = new ProtoOut
    example.bytesField(1, features.toBytes) // Example.features = 1
    example.toBytes
  }

  /** DISTRIBUTED encoder: one `record` binary column of tf.Example bytes
    * per row — the narrow map production sharding composes with (encode
    * here, frame+write shards via the layout machinery). */
  def toExampleBytes(df: DataFrame, out: String = "record"): DataFrame = {
    val schema = df.schema
    val enc = org.apache.spark.sql.Encoders.row(
      StructType(schema.fields :+ StructField(out, BinaryType, nullable = false)))
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ exampleBytes(schema, r)))
    }(enc)
  }

  /** Driver-side guarded writer — one .tfrecord file of framed
    * tf.Example records. Same contract as AvroIO.write. */
  def write(df: DataFrame, path: String, maxRows: Long = DefaultMaxRows): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"TFRecordIO.write: $n rows exceeds the $maxRows-row exchange-path guard")
    val schema = df.schema
    val out = new File(path)
    Option(out.getParentFile).foreach(_.mkdirs())
    val os = new BufferedOutputStream(new FileOutputStream(out))
    try df.collect().foreach { r =>
      val framed = frame(exampleBytes(schema, r))
      os.write(framed, 0, framed.length)
    } finally os.close()
  }

  /** DISTRIBUTED sharded export — the production TFRecord writer (the
    * guarded [[write]] is the small exchange path): rows shard by the
    * pinned fingerprint of `idCol` (deterministic, replayable —
    * [[graft.operators.Sampling.shardOf]]), colocate per shard, sort by
    * id within the shard, and each executor streams its shards' framed
    * tf.Examples straight to `dir/part-NNNNN.tfrecord` through the
    * Hadoop FileSystem API (local FS here, HDFS/object stores on a
    * cluster — no driver collect, no maxRows guard needed). Determinism
    * is byte-level: same input → identical shard files, so the export
    * composes with the shard-manifest verification artifact. Returns
    * the shard count. */
  def writeSharded(df: DataFrame, dir: String, idCol: String,
      nShards: Int, codec: String = "none"): Int = {
    require(nShards >= 1, s"TFRecordIO.writeSharded: nShards must be >= 1")
    require(codec == "none" || codec == "gzip",
      s"TFRecordIO.writeSharded: codec must be none|gzip, got $codec")
    val gz = codec == "gzip"
    val schema = df.schema
    df.withColumn("__shard", graft.operators.Sampling.shardOf(col(idCol), nShards))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(idCol))
      .foreachPartition { rows: Iterator[Row] =>
        // default Hadoop conf resolves local paths and standard
        // cluster filesystems; Spark's SerializableConfiguration is
        // private[spark], and the writer needs no session-specific keys
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
        fs.setWriteChecksum(false) // no .crc sidecars: TFRecord frames
        // carry their own CRC32C per record
        var current = -1L
        var out: java.io.OutputStream = null
        val shardIdx = schema.length // __shard rides as the LAST column
        try {
          rows.foreach { r =>
            val shard = r.getLong(shardIdx)
            if (shard != current) {
              if (out != null) out.close()
              val name =
                if (gz) f"part-$shard%05d.tfrecord.gz"
                else f"part-$shard%05d.tfrecord"
              val raw = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
              // whole-file gzip — the layout tf.data's GZIP option reads
              out = if (gz) new java.util.zip.GZIPOutputStream(raw) else raw
              current = shard
            }
            val framed = frame(exampleBytes(schema,
              Row.fromSeq(r.toSeq.dropRight(1))))
            out.write(framed, 0, framed.length)
          }
        } finally if (out != null) out.close()
      }
    nShards
  }

  // ---- tf.Example decode ----

  /** Decode one tf.Example against the caller's schema: features looked
    * up by name, list arity reconciled with the field type (a 1-element
    * list decodes to the scalar; a scalar field meeting a longer list is
    * an error, not a silent truncation). Absent features are null. */
  def decodeExample(schema: StructType, payload: Array[Byte]): Row = {
    // feature name -> (kind, raw value bounds); kinds 1/2/3 per Feature
    val found = scala.collection.mutable.HashMap.empty[String, (Int, Array[Byte])]
    val ex = new ProtoIn(payload, 0, payload.length)
    while (ex.hasMore) {
      val (field, wire) = ex.tag()
      if (field == 1 && wire == 2) {
        val (fs, fe) = ex.delimited() // Features
        val feats = new ProtoIn(payload, fs, fe)
        while (feats.hasMore) {
          val (f2, w2) = feats.tag()
          if (f2 == 1 && w2 == 2) {
            val (es, ee) = feats.delimited() // map entry
            val entry = new ProtoIn(payload, es, ee)
            var name: String = null
            var kind = -1
            var value: Array[Byte] = null
            while (entry.hasMore) {
              val (f3, w3) = entry.tag()
              if (f3 == 1 && w3 == 2) {
                val (ks, ke) = entry.delimited()
                name = new String(payload, ks, ke - ks, "UTF-8")
              } else if (f3 == 2 && w3 == 2) {
                val (vs, ve) = entry.delimited() // Feature
                val feat = new ProtoIn(payload, vs, ve)
                while (feat.hasMore) {
                  val (f4, w4) = feat.tag()
                  if (f4 >= 1 && f4 <= 3 && w4 == 2) {
                    val (ls, le) = feat.delimited()
                    kind = f4
                    value = java.util.Arrays.copyOfRange(payload, ls, le)
                  } else feat.skip(w4)
                }
              } else entry.skip(w3)
            }
            if (name != null && kind > 0) found(name) = (kind, value)
          } else feats.skip(w2)
        }
      } else ex.skip(wire)
    }
    def int64s(list: Array[Byte]): Seq[Long] = {
      val out = Seq.newBuilder[Long]
      val in = new ProtoIn(list, 0, list.length)
      while (in.hasMore) {
        val (f, w) = in.tag()
        if (f == 1 && w == 2) { // packed
          val (s, e) = in.delimited()
          val p = new ProtoIn(list, s, e)
          while (p.hasMore) out += p.varint()
        } else if (f == 1 && w == 0) out += in.varint() // unpacked writer
        else in.skip(w)
      }
      out.result()
    }
    def floats(list: Array[Byte]): Seq[Float] = {
      val out = Seq.newBuilder[Float]
      val in = new ProtoIn(list, 0, list.length)
      while (in.hasMore) {
        val (f, w) = in.tag()
        if (f == 1 && w == 2) {
          val (s, e) = in.delimited()
          var i = s
          while (i < e) { out += java.lang.Float.intBitsToFloat(readLe32(list, i)); i += 4 }
        } else if (f == 1 && w == 5) out += java.lang.Float.intBitsToFloat(in.fixed32())
        else in.skip(w)
      }
      out.result()
    }
    def bytess(list: Array[Byte]): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      val in = new ProtoIn(list, 0, list.length)
      while (in.hasMore) {
        val (f, w) = in.tag()
        if (f == 1 && w == 2) {
          val (s, e) = in.delimited()
          out += java.util.Arrays.copyOfRange(list, s, e)
        } else in.skip(w)
      }
      out.result()
    }
    def scalar[T](name: String, vals: Seq[T]): T = {
      require(vals.length == 1,
        s"TFRecordIO: feature '$name' has ${vals.length} values for a scalar field")
      vals.head
    }
    Row.fromSeq(schema.fields.toIndexedSeq.map { sf =>
      found.get(sf.name) match {
        case None => null
        case Some((kind, list)) => (sf.dataType, kind) match {
          case (LongType, 3) => scalar(sf.name, int64s(list))
          case (IntegerType, 3) =>
            val v = scalar(sf.name, int64s(list))
            require(v >= Int.MinValue && v <= Int.MaxValue,
              s"TFRecordIO: feature '${sf.name}' value $v overflows IntegerType")
            v.toInt
          case (BooleanType, 3) => scalar(sf.name, int64s(list)) != 0L
          case (FloatType, 2) => scalar(sf.name, floats(list))
          case (StringType, 1) => new String(scalar(sf.name, bytess(list)), "UTF-8")
          case (BinaryType, 1) => scalar(sf.name, bytess(list))
          case (ArrayType(LongType, _), 3) => int64s(list)
          case (ArrayType(IntegerType, _), 3) => int64s(list).map { v =>
            require(v >= Int.MinValue && v <= Int.MaxValue,
              s"TFRecordIO: feature '${sf.name}' value $v overflows IntegerType")
            v.toInt
          }
          case (ArrayType(FloatType, _), 2) => floats(list)
          case (ArrayType(StringType, _), 1) => bytess(list).map(new String(_, "UTF-8"))
          case (dt, k) => throw new IllegalArgumentException(
            s"TFRecordIO: feature '${sf.name}' is kind $k, schema says $dt")
        }
      }
    })
  }

  /** Distributed reader over a file or a directory of .tfrecord shards:
    * one task per file via binaryFiles (small shards combine; frames are
    * never split mid-file). tf.Example carries no schema — the caller's
    * `schema` picks the features and types, exactly like TensorFlow's
    * parse_example feature spec. Both frame CRCs verify on every record. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, stream) =>
        val raw = stream.toArray()
        def gunzip(b: Array[Byte]): Array[Byte] = {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(b))
          try in.readAllBytes() finally in.close()
        }
        // Route by extension first (writeSharded names .tfrecord.gz
        // deterministically). The 1F 8B magic sniff alone is NOT a safe
        // router: an uncompressed file whose first record length is
        // ≡ 0x8B1F (mod 2^16) starts with the same two bytes (~1/65536
        // of shards at scale) — so a sniffed gunzip that fails falls
        // back to parsing the bytes as raw frames (whose CRCs verify).
        val bytes =
          if (file.endsWith(".gz")) gunzip(raw)
          else if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F &&
              (raw(1) & 0xFF) == 0x8B)
            try gunzip(raw) catch { case _: java.io.IOException => raw }
          else raw
        frames(bytes).map(decodeExample(schema, _))
      }
    spark.createDataFrame(rdd, schema)
  }
}
