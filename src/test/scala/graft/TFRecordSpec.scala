package graft

import graft.sources.TFRecordIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord framing (masked CRC32C) and tf.Example wire encode/decode. */
class TFRecordSpec extends SparkSpec {
  import spark.implicits._

  test("framing: records roundtrip; any corrupt byte is a CRC error") {
    val recs = Seq("alpha".getBytes, Array.empty[Byte], Array.fill[Byte](1000)(7))
    val buf = recs.map(TFRecordIO.frame).reduce(_ ++ _)
    val back = TFRecordIO.frames(buf).toSeq
    assert(back.map(_.toSeq) === recs.map(_.toSeq))
    // flip one byte anywhere -> some frame's CRC or bounds check trips
    for (i <- buf.indices by 7) {
      val bad = buf.clone(); bad(i) = (bad(i) ^ 0x40).toByte
      assertThrows[Exception](TFRecordIO.frames(bad).toList)
    }
    // the CRC32C primitive matches the public check vector
    val c = new java.util.zip.CRC32C(); c.update("123456789".getBytes, 0, 9)
    assert(c.getValue === 0xE3069283L)
  }

  private val fullSchema = StructType(Seq(
    StructField("id", LongType), StructField("n", IntegerType),
    StructField("flag", BooleanType), StructField("score", FloatType),
    StructField("name", StringType), StructField("blob", BinaryType),
    StructField("ids", ArrayType(LongType)),
    StructField("emb", ArrayType(FloatType)),
    StructField("tags", ArrayType(StringType))))

  test("tf.Example roundtrip: every supported type, nulls as absent features") {
    val rows = Seq(
      Row(7L, 3, true, 1.5f, "héllo", Array[Byte](1, 2, 3),
        Seq(1L, 2L, 3L), Seq(0.25f, -4f), Seq("a", "bb")),
      Row(null, null, null, null, null, null, null, null, null),
      Row(-9L, -1, false, Float.NaN, "", Array.empty[Byte],
        Seq.empty[Long], Seq.empty[Float], Seq.empty[String]))
    rows.foreach { r =>
      val back = TFRecordIO.decodeExample(fullSchema,
        TFRecordIO.exampleBytes(fullSchema, r))
      fullSchema.fields.indices.foreach { i =>
        (r.get(i), back.get(i)) match {
          case (null, b) => assert(b == null, s"field $i")
          case (a: Array[Byte], b) =>
            assert(a.toSeq == b.asInstanceOf[Array[Byte]].toSeq, s"field $i")
          case (a: Float, b: Float) if a.isNaN => assert(b.isNaN, s"field $i")
          case (a, b) => assert(a == b, s"field $i")
        }
      }
    }
    // empty lists encode as PRESENT features with zero elements — they
    // come back empty, not null (absent means null)
    val empties = TFRecordIO.decodeExample(fullSchema,
      TFRecordIO.exampleBytes(fullSchema, rows(2)))
    assert(empties.getSeq[Long](6).isEmpty && !empties.isNullAt(6))
  }

  test("decode arity and kind contracts") {
    val s1 = StructType(Seq(StructField("x", LongType)))
    val multi = TFRecordIO.exampleBytes(
      StructType(Seq(StructField("x", ArrayType(LongType)))),
      Row(Seq(1L, 2L)))
    // multi-value list into a scalar field: error, never silent truncation
    assertThrows[IllegalArgumentException](TFRecordIO.decodeExample(s1, multi))
    // kind mismatch: float_list where the schema says long
    val f = TFRecordIO.exampleBytes(
      StructType(Seq(StructField("x", FloatType))), Row(1.0f))
    assertThrows[IllegalArgumentException](TFRecordIO.decodeExample(s1, f))
    // doubles are rejected at encode (tf.Example has no double list)
    assertThrows[IllegalArgumentException](TFRecordIO.exampleBytes(
      StructType(Seq(StructField("x", DoubleType))), Row(1.0)))
    // int64 overflowing IntegerType is an error, never a silent .toInt
    val big = TFRecordIO.exampleBytes(
      StructType(Seq(StructField("x", LongType))), Row(4294967301L))
    assertThrows[IllegalArgumentException](TFRecordIO.decodeExample(
      StructType(Seq(StructField("x", IntegerType))), big))
    // malformed proto inside a CRC-valid frame: truncated fixed32 is a
    // deliberate error, not an ArrayIndexOutOfBounds from an executor
    val f32 = TFRecordIO.exampleBytes(
      StructType(Seq(StructField("x", FloatType))), Row(1.5f))
    val cut = java.util.Arrays.copyOf(f32, f32.length - 2)
    val e = intercept[Exception](TFRecordIO.decodeExample(
      StructType(Seq(StructField("x", FloatType))), cut))
    assert(e.getMessage.contains("TFRecord"), e.toString)
  }

  test("file roundtrip: guarded write, distributed read over a shard directory") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("emb", ArrayType(FloatType))))
    val df = spark.range(300).select($"id",
      concat(lit("doc-"), $"id").as("name"),
      array(($"id" * 2).cast("float"), lit(0.5f)).as("emb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tfr").toString
    // two shards, as a sharded export would lay them out
    TFRecordIO.write(df.where($"id" < 150), s"$dir/part-0.tfrecord")
    TFRecordIO.write(df.where($"id" >= 150), s"$dir/part-1.tfrecord")
    val back = TFRecordIO.read(spark, dir, schema).orderBy("id")
    assert(back.count() === 300)
    val rows = back.collect()
    assert(rows(7) === Row(7L, "doc-7", Seq(14f, 0.5f)))
    assert(rows(299) === Row(299L, "doc-299", Seq(598f, 0.5f)))
    // the distributed encoder produces byte-identical records
    val viaCol = TFRecordIO.toExampleBytes(df.where($"id" === 7).select(
      $"id", $"name", $"emb")).select("record").head().getAs[Array[Byte]](0)
    val viaDriver = TFRecordIO.exampleBytes(schema, Row(7L, "doc-7", Seq(14f, 0.5f)))
    assert(viaCol.toSeq === viaDriver.toSeq)
  }

  test("writeSharded: distributed export, deterministic bytes, shardOf placement") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = spark.range(500).select($"id", concat(lit("d"), $"id").as("name"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tfrs").toString
    TFRecordIO.writeSharded(df, s"$dir/a", "id", nShards = 8)
    // full roundtrip across all shards
    val back = TFRecordIO.read(spark, s"$dir/a", schema)
    assert(back.count() === 500)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq === (0L until 500L))
    // placement honors the pinned shard fingerprint
    val want = df.withColumn("s",
        graft.operators.Sampling.shardOf(col("id"), 8))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { sh =>
      val f = s"$dir/a/part-$sh%05d.tfrecord".format(sh)
      val p = new java.io.File(f"$dir/a/part-$sh%05d.tfrecord")
      if (want.getOrElse(sh.toLong, 0L) > 0) {
        val n = TFRecordIO.frames(
          java.nio.file.Files.readAllBytes(p.toPath)).size
        assert(n.toLong === want(sh.toLong), s"shard $sh")
      }
    }
    // gzip codec: compressed shards sniff by magic on read and
    // roundtrip identically (tf.data's GZIP compression_type layout)
    TFRecordIO.writeSharded(df, s"$dir/gz", "id", nShards = 4, codec = "gzip")
    val gzFiles = new java.io.File(s"$dir/gz").listFiles()
      .filterNot(_.getName.startsWith("."))
    assert(gzFiles.nonEmpty && gzFiles.forall(_.getName.endsWith(".tfrecord.gz")))
    val gzBack = TFRecordIO.read(spark, s"$dir/gz", schema)
    assert(gzBack.count() === 500)
    assert(gzBack.orderBy("id").collect().map(_.getLong(0)).toSeq === (0L until 500L))
    // byte determinism: a second export writes identical files
    TFRecordIO.writeSharded(df.repartition(7), s"$dir/b", "id", nShards = 8)
    (0 until 8).foreach { sh =>
      val a = new java.io.File(f"$dir/a/part-$sh%05d.tfrecord")
      val b = new java.io.File(f"$dir/b/part-$sh%05d.tfrecord")
      assert(a.exists === b.exists, s"shard $sh presence")
      if (a.exists) assert(
        java.nio.file.Files.readAllBytes(a.toPath).toSeq ===
          java.nio.file.Files.readAllBytes(b.toPath).toSeq, s"shard $sh bytes")
    }
  }

  test("read: uncompressed shard whose first length bytes spell the gzip magic") {
    // A raw TFRecord file starts with the first record's u64-LE payload
    // length: a payload of exactly 0x8B1F = 35615 bytes makes the file
    // begin 1F 8B — the gzip magic. The reader must not die in
    // GZIPInputStream on it (~1/65536 of shards at scale): the sniffed
    // gunzip fails and falls back to raw frame parsing.
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType)))
    def payload(n: Int) =
      TFRecordIO.exampleBytes(schema, Row(1L, Array.fill[Byte](n)(42)))
    // converge blob size so the framed payload is exactly 35615 bytes
    // (encoding overhead is deterministic; varint length steps are ≤ +1)
    var n = 35550
    var p = payload(n)
    while (p.length != 35615) { n += 35615 - p.length; p = payload(n) }
    val second = TFRecordIO.exampleBytes(schema, Row(2L, Array[Byte](7)))
    val dir = java.nio.file.Files.createTempDirectory("graft_tfr_magic")
    val f = dir.resolve("part-00000.tfrecord")
    java.nio.file.Files.write(f, TFRecordIO.frame(p) ++ TFRecordIO.frame(second))
    assert { // preconditions: really starts 1F 8B, really not gzip
      val head = java.nio.file.Files.readAllBytes(f).take(2)
      (head(0) & 0xFF) == 0x1F && (head(1) & 0xFF) == 0x8B
    }
    val back = TFRecordIO.read(spark, dir.toString, schema).orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L &&
      back(0).getAs[Array[Byte]](1).length === n)
    assert(back(1).getLong(0) === 2L)
  }
}
