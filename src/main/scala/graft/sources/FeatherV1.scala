package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Feather v1 ("FEA1") reader/writer — the reference's default columnar
  * format (reference: native_libs/src/IO/Feather.cpp:10-62). Arrow Java
  * only speaks Arrow IPC (= Feather v2), so the legacy v1 container is
  * parsed directly: `FEA1` magic, 8-byte-aligned column segments
  * (validity bitmap, UTF8 offsets, values), a flatbuffer `CTable`
  * metadata block, its uint32 size, and the trailing magic. The
  * flatbuffer schema is Arrow's public `feather.fbs` (PLAIN-encoded
  * primitive arrays; dictionary/category encoding is rejected).
  *
  * Scale stance: v1 is a single-file legacy INGEST format — it has no
  * row groups and no splittable layout, so the file is materialized
  * driver-side and parallelized; the engine's columnar fast path stays
  * Parquet. Read once, write Parquet, query forever.
  */
object FeatherV1 {

  // feather.fbs Type enum
  private val BOOL = 0; private val INT8 = 1; private val INT16 = 2
  private val INT32 = 3; private val INT64 = 4; private val UINT8 = 5
  private val UINT16 = 6; private val UINT32 = 7; private val UINT64 = 8
  private val FLOAT = 9; private val DOUBLE = 10; private val UTF8 = 11
  private val TIMESTAMP = 14; private val DATE = 15

  /** Minimal flatbuffer accessor (little-endian, absolute positions). */
  private final class FB(bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bb.get(p) & 0xFF
    def i16(p: Int): Int = bb.getShort(p) & 0xFFFF
    def i32(p: Int): Int = bb.getInt(p)
    def i64(p: Int): Long = bb.getLong(p)
    /** Follow a uoffset to the referenced position. */
    def indirect(p: Int): Int = p + i32(p)
    /** Absolute position of table field `idx`, or None if absent. */
    def field(table: Int, idx: Int): Option[Int] = {
      val vt = table - i32(table)
      val slot = 4 + 2 * idx
      if (slot + 2 > i16(vt)) None
      else {
        val off = i16(vt + slot)
        if (off == 0) None else Some(table + off)
      }
    }
    def str(pos: Int): String = {
      val p = indirect(pos)
      new String(bytes, p + 4, i32(p), "UTF-8")
    }
    def vectorLen(pos: Int): Int = i32(indirect(pos))
    /** Element position of table-vector element i (elements are uoffsets). */
    def vectorTable(pos: Int, i: Int): Int = {
      val v = indirect(pos)
      indirect(v + 4 + 4 * i)
    }
  }

  private case class Col(name: String, tpe: Int, offset: Long, length: Long,
      nullCount: Long, totalBytes: Long, tsUnit: Int)

  private def parseMeta(bytes: Array[Byte]): (Long, Seq[Col]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "ASCII") == "FEA1" &&
      new String(bytes, bytes.length - 4, 4, "ASCII") == "FEA1",
      "not a Feather v1 file (FEA1 magic missing)")
    val fb = new FB(bytes)
    val metaSize = fb.i32(bytes.length - 8)
    val metaStart = bytes.length - 8 - metaSize
    val root = fb.indirect(metaStart) // CTable
    val numRows = fb.field(root, 1).map(fb.i64).getOrElse(0L)
    val cols = fb.field(root, 2).map { colsPos =>
      (0 until fb.vectorLen(colsPos)).map { i =>
        val c = fb.vectorTable(colsPos, i)
        val name = fb.field(c, 0).map(fb.str).getOrElse("")
        val pa = fb.field(c, 1).map(fb.indirect).getOrElse(
          throw new IllegalArgumentException(s"feather: column '$name' has no values"))
        val tpe = fb.field(pa, 0).map(fb.u8).getOrElse(0)
        val enc = fb.field(pa, 1).map(fb.u8).getOrElse(0)
        if (enc != 0) throw new UnsupportedOperationException(
          s"feather: dictionary-encoded column '$name' not supported (PLAIN only)")
        val off = fb.field(pa, 2).map(fb.i64).getOrElse(0L)
        val len = fb.field(pa, 3).map(fb.i64).getOrElse(0L)
        val nulls = fb.field(pa, 4).map(fb.i64).getOrElse(0L)
        val total = fb.field(pa, 5).map(fb.i64).getOrElse(0L)
        // metadata union: type at field 2, value table at field 3.
        // TypeMetadata members: 1=Category, 2=Timestamp, 3=Date, 4=Time.
        // v1 writers store timestamp/date VALUES as INT64/INT32 and put
        // the logical type here, so the union overrides the physical type.
        val unionType = fb.field(c, 2).map(fb.u8).getOrElse(0)
        val effType = unionType match {
          case 2 => TIMESTAMP
          case 3 => DATE
          case 1 => throw new UnsupportedOperationException(
            s"feather: category-encoded column '$name' not supported")
          case 4 => throw new UnsupportedOperationException(
            s"feather: time-of-day column '$name' not supported")
          case _ => tpe
        }
        val tsUnit =
          if (unionType == 2)
            fb.field(c, 3).map(p => {
              val tm = fb.indirect(p)
              fb.field(tm, 0).map(fb.u8).getOrElse(0)
            }).getOrElse(0)
          else 0
        Col(name, effType, off, len, nulls, total, tsUnit)
      }
    }.getOrElse(Seq.empty)
    (numRows, cols)
  }

  private def pad8(n: Long): Long = (n + 7) & ~7L

  private def sparkType(c: Col): DataType = c.tpe match {
    case BOOL => BooleanType
    case INT8 => ByteType
    case INT16 => ShortType
    case INT32 => IntegerType
    case INT64 => LongType
    case UINT8 | UINT16 => IntegerType
    case UINT32 | UINT64 => LongType // UINT64 > Long.Max would wrap; reference emits none
    case FLOAT => FloatType
    case DOUBLE => DoubleType
    case UTF8 => StringType
    case TIMESTAMP => TimestampType
    case DATE => DateType
    case other => throw new UnsupportedOperationException(s"feather: type id $other")
  }

  /** Decode one column into length boxed values (null where bitmap clear). */
  private def decode(bytes: Array[Byte], c: Col): Array[Any] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = c.length.toInt
    var pos = c.offset
    val valid: Int => Boolean =
      if (c.nullCount > 0) {
        val bitmapAt = pos
        pos += pad8((n + 7) / 8)
        i => (bytes(bitmapAt.toInt + (i >> 3)) & (1 << (i & 7))) != 0
      } else _ => true
    val offsetsAt =
      if (c.tpe == UTF8) { val p = pos; pos += pad8(4L * (n + 1)); p } else 0L
    val valuesAt = pos.toInt

    val tsScale = c.tsUnit match {
      case 0 => 1000000L // SECOND -> us
      case 1 => 1000L    // MILLI
      case 2 => 1L       // MICRO
      case 3 => -1000L   // NANO (divide)
      case u => throw new UnsupportedOperationException(s"feather: time unit $u")
    }
    def tsMicros(raw: Long): Long = // floorDiv: pre-epoch nanos must floor, not truncate toward zero
      if (tsScale > 0) raw * tsScale else Math.floorDiv(raw, -tsScale)

    Array.tabulate[Any](n) { i =>
      if (!valid(i)) null
      else c.tpe match {
        case BOOL   => (bytes(valuesAt + (i >> 3)) & (1 << (i & 7))) != 0
        case INT8   => bb.get(valuesAt + i)
        case INT16  => bb.getShort(valuesAt + 2 * i)
        case INT32  => bb.getInt(valuesAt + 4 * i)
        case INT64  => bb.getLong(valuesAt + 8 * i)
        case UINT8  => bytes(valuesAt + i) & 0xFF
        case UINT16 => bb.getShort(valuesAt + 2 * i) & 0xFFFF
        case UINT32 => bb.getInt(valuesAt + 4 * i).toLong & 0xFFFFFFFFL
        case UINT64 => bb.getLong(valuesAt + 8 * i)
        case FLOAT  => bb.getFloat(valuesAt + 4 * i)
        case DOUBLE => bb.getDouble(valuesAt + 8 * i)
        case UTF8 =>
          val o0 = bb.getInt((offsetsAt + 4L * i).toInt)
          val o1 = bb.getInt((offsetsAt + 4L * (i + 1)).toInt)
          new String(bytes, valuesAt + o0, o1 - o0, "UTF-8")
        case TIMESTAMP =>
          val us = tsMicros(bb.getLong(valuesAt + 8 * i))
          java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
        case DATE =>
          java.time.LocalDate.ofEpochDay(bb.getInt(valuesAt + 4 * i).toLong)
        case other => throw new UnsupportedOperationException(s"feather: type id $other")
      }
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    require(Files.size(Paths.get(path)) < Int.MaxValue.toLong,
      "feather: v1 files over 2 GiB are not supported by this driver-side " +
        "reader (the format is not splittable); convert the producer to Parquet")
    val bytes = Files.readAllBytes(Paths.get(path))
    val (numRows, cols) = parseMeta(bytes)
    val schema = StructType(cols.map(c => StructField(c.name, sparkType(c))))
    val decoded = cols.map(decode(bytes, _)).toArray
    val rows = new java.util.ArrayList[Row](numRows.toInt)
    var i = 0
    while (i < numRows) {
      rows.add(Row.fromSeq(decoded.indices.map(j => decoded(j)(i.toInt))))
      i += 1
    }
    spark.createDataFrame(rows, schema)
  }

  // ---------------------------------------------------------------- write

  /** Minimal back-to-front flatbuffer builder (standard algorithm:
    * children before parents, offsets measured as distance from buffer
    * end, vtables per table). Only what CTable needs. */
  private final class FBB {
    private var buf = new Array[Byte](4096)
    private var head = buf.length
    private var minalign = 1
    def size: Int = buf.length - head
    private def ensure(n: Int): Unit =
      if (head < n) {
        val grown = new Array[Byte](buf.length * 2 + n)
        System.arraycopy(buf, head, grown, grown.length - size, size)
        head = grown.length - size
        buf = grown
      }
    private def pad(n: Int): Unit = { ensure(n); var i = 0; while (i < n) { head -= 1; buf(head) = 0; i += 1 } }
    def prep(align: Int, extra: Int): Unit = {
      if (align > minalign) minalign = align
      var alignSize = ((~(size + extra)) + 1) & (align - 1)
      pad(alignSize)
    }
    private def put(n: Int)(write: Int => Unit): Unit = { ensure(n); head -= n; write(head) }
    def push8(v: Byte): Unit = put(1)(p => buf(p) = v)
    def push16(v: Short): Unit = put(2) { p => buf(p) = v.toByte; buf(p + 1) = (v >> 8).toByte }
    def push32(v: Int): Unit = put(4) { p =>
      var i = 0; while (i < 4) { buf(p + i) = (v >> (8 * i)).toByte; i += 1 } }
    def push64(v: Long): Unit = put(8) { p =>
      var i = 0; while (i < 8) { buf(p + i) = (v >> (8 * i)).toByte; i += 1 } }
    def pushBytes(b: Array[Byte]): Unit = put(b.length)(p => System.arraycopy(b, 0, buf, p, b.length))
    /** uoffset slot referencing a previously returned offset. */
    def pushRef(target: Int): Unit = { prep(4, 0); ensure(4); head -= 4
      val v = size - target
      var i = 0; while (i < 4) { buf(head + i) = (v >> (8 * i)).toByte; i += 1 } }
    def createString(s: String): Int = {
      val b = s.getBytes("UTF-8")
      prep(4, b.length + 1)
      push8(0) // null terminator, like the C++ builder
      pushBytes(b)
      push32(b.length)
      size
    }
    def createRefVector(offsets: Seq[Int]): Int = {
      prep(4, offsets.length * 4 + 4)
      offsets.reverseIterator.foreach(pushRef)
      push32(offsets.length)
      size
    }
    /** Emit a table: fields as (slotIndex, writer, alignment, byteSize,
      * isRef+targetOffset). Writers run back-to-front in slot order. */
    def table(fields: Seq[(Int, FBB => Unit)]): Int = {
      val objectStart = size
      // write field data in reverse slot order, tracking written positions
      val fieldDist = scala.collection.mutable.Map[Int, Int]()
      fields.reverseIterator.foreach { case (slot, w) => w(this); fieldDist(slot) = size }
      prep(4, 0)
      ensure(4); head -= 4 // reserve soffset
      val tableDist = size
      val nSlots = if (fields.isEmpty) 0 else fields.map(_._1).max + 1
      val tableSize = tableDist - objectStart
      (nSlots - 1) to 0 by -1 foreach { i =>
        push16(fieldDist.get(i).map(d => (tableDist - d).toShort).getOrElse(0.toShort))
      }
      push16(tableSize.toShort)
      push16((4 + 2 * nSlots).toShort)
      val vtDist = size
      // patch the reserved soffset: vtable_pos = table_pos - soffset
      val p = buf.length - tableDist
      val v = vtDist - tableDist
      var i = 0; while (i < 4) { buf(p + i) = (v >> (8 * i)).toByte; i += 1 }
      tableDist
    }
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      pushRef(root)
      java.util.Arrays.copyOfRange(buf, head, buf.length)
    }
  }

  private def bitmap(nulls: Array[Boolean]): Array[Byte] = {
    val out = new Array[Byte]((nulls.length + 7) / 8)
    var i = 0
    while (i < nulls.length) {
      if (!nulls(i)) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Driver-memory guard for [[write]]: Feather v1 is a single-file
    * exchange format, so the writer collects — above this many rows the
    * export is refused with a pointer at the scale sinks instead of
    * OOM-ing the driver. Override per call when the driver heap is
    * known to fit more. */
  val DefaultMaxRows: Long = 5L * 1000 * 1000

  /** Write a DataFrame as a Feather v1 file. Collects driver-side — v1 is
    * the reference's single-file EXPORT/compat format, not the engine's
    * scale sink (that is Parquet): use it to hand results back to a
    * reference-toolchain consumer. Refuses above `maxRows` (collect
    * would OOM the driver silently otherwise); the limit+collect probe
    * reads at most maxRows+1 rows, never the full overage. */
  def write(df: DataFrame, path: String, maxRows: Long = DefaultMaxRows): Unit = {
    val rows = df.limit(math.min(maxRows, Int.MaxValue - 1).toInt + 1).collect()
    if (rows.length > maxRows)
      throw new IllegalArgumentException(
        s"Feather v1 export collects driver-side and $path would exceed " +
          s"$maxRows rows. Write Parquet for scale (df.write.parquet), or " +
          "convert a bounded slice via graft.tools.FeatherConvert; raise " +
          "maxRows explicitly if the driver heap is known to fit it.")
    val n = rows.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("FEA1".getBytes("ASCII"))

    def pos(): Long = out.size().toLong
    def padTo8(): Unit = while (out.size() % 8 != 0) out.write(0)
    def writePadded(b: Array[Byte]): Unit = { out.write(b); padTo8() }

    case class Written(tpe: Int, offset: Long, nullCount: Long, totalBytes: Long, tsUnit: Int)

    val written = df.schema.fields.zipWithIndex.map { case (f, ci) =>
      padTo8()
      val start = pos()
      val isNull = Array.tabulate(n)(r => rows(r).isNullAt(ci))
      val nullCount = isNull.count(identity)
      if (nullCount > 0) writePadded(bitmap(isNull))
      val le = ByteOrder.LITTLE_ENDIAN
      def longs(get: Int => Long): Unit = {
        val bb = ByteBuffer.allocate(8 * n).order(le)
        (0 until n).foreach(r => bb.putLong(if (isNull(r)) 0L else get(r)))
        writePadded(bb.array())
      }
      def ints(get: Int => Int): Unit = {
        val bb = ByteBuffer.allocate(4 * n).order(le)
        (0 until n).foreach(r => bb.putInt(if (isNull(r)) 0 else get(r)))
        writePadded(bb.array())
      }
      val (tpe, tsUnit) = f.dataType match {
        case BooleanType =>
          val bits = new Array[Byte]((n + 7) / 8)
          (0 until n).foreach(r => if (!isNull(r) && rows(r).getBoolean(ci))
            bits(r >> 3) = (bits(r >> 3) | (1 << (r & 7))).toByte)
          writePadded(bits); (BOOL, 0)
        case ByteType =>
          writePadded(Array.tabulate(n)(r => if (isNull(r)) 0.toByte else rows(r).getByte(ci)))
          (INT8, 0)
        case ShortType =>
          val bb = ByteBuffer.allocate(2 * n).order(le)
          (0 until n).foreach(r => bb.putShort(if (isNull(r)) 0 else rows(r).getShort(ci)))
          writePadded(bb.array()); (INT16, 0)
        case IntegerType => ints(r => rows(r).getInt(ci)); (INT32, 0)
        case LongType => longs(r => rows(r).getLong(ci)); (INT64, 0)
        case FloatType =>
          val bb = ByteBuffer.allocate(4 * n).order(le)
          (0 until n).foreach(r => bb.putFloat(if (isNull(r)) 0f else rows(r).getFloat(ci)))
          writePadded(bb.array()); (FLOAT, 0)
        case DoubleType =>
          val bb = ByteBuffer.allocate(8 * n).order(le)
          (0 until n).foreach(r => bb.putDouble(if (isNull(r)) 0d else rows(r).getDouble(ci)))
          writePadded(bb.array()); (DOUBLE, 0)
        case StringType =>
          val utf8 = Array.tabulate(n)(r =>
            if (isNull(r)) Array.empty[Byte] else rows(r).getString(ci).getBytes("UTF-8"))
          val offs = ByteBuffer.allocate(4 * (n + 1)).order(le)
          var acc = 0
          offs.putInt(0)
          utf8.foreach { b => acc += b.length; offs.putInt(acc) }
          writePadded(offs.array())
          writePadded(utf8.flatten)
          (UTF8, 0)
        case TimestampType =>
          // external type depends on spark.sql.datetime.java8API.enabled:
          // java.sql.Timestamp by default, java.time.Instant when on
          longs { r =>
            rows(r).getAs[Any](ci) match {
              case t: java.sql.Timestamp =>
                t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
              case t: java.time.Instant =>
                t.getEpochSecond * 1000000L + t.getNano / 1000L
            }
          }
          (TIMESTAMP, 2) // MICROSECOND
        case TimestampNTZType =>
          longs { r =>
            val t = rows(r).getAs[java.time.LocalDateTime](ci)
            t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
          }
          (TIMESTAMP, 2)
        case DateType =>
          ints { r =>
            rows(r).getAs[Any](ci) match {
              case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
              case d: java.time.LocalDate => d.toEpochDay.toInt
            }
          }
          (DATE, 0)
        case other => throw new UnsupportedOperationException(
          s"feather write: unsupported column type $other (flatten/stringify first)")
      }
      Written(tpe, start, nullCount, pos() - start, tsUnit)
    }

    // metadata flatbuffer
    val fbb = new FBB
    val colOffsets = df.schema.fields.zip(written).map { case (f, w) =>
      val nameOff = fbb.createString(f.name)
      val physType = w.tpe match { case TIMESTAMP => INT64; case DATE => INT32; case t => t }
      val paOff = fbb.table(Seq(
        0 -> ((b: FBB) => { b.prep(1, 0); b.push8(physType.toByte) }),
        2 -> ((b: FBB) => { b.prep(8, 0); b.push64(w.offset) }),
        3 -> ((b: FBB) => { b.prep(8, 0); b.push64(n.toLong) }),
        4 -> ((b: FBB) => { b.prep(8, 0); b.push64(w.nullCount) }),
        5 -> ((b: FBB) => { b.prep(8, 0); b.push64(w.totalBytes) })))
      val metaOff: Option[(Int, Int)] = w.tpe match {
        case TIMESTAMP =>
          val tm = fbb.table(Seq(0 -> ((b: FBB) => { b.prep(1, 0); b.push8(w.tsUnit.toByte) })))
          Some((2, tm)) // union member 2 = TimestampMetadata
        case DATE =>
          val dm = fbb.table(Seq.empty)
          Some((3, dm))
        case _ => None
      }
      fbb.table(Seq(
        0 -> ((b: FBB) => b.pushRef(nameOff)),
        1 -> ((b: FBB) => b.pushRef(paOff))) ++
        metaOff.toSeq.flatMap { case (ut, off) => Seq(
          2 -> ((b: FBB) => { b.prep(1, 0); b.push8(ut.toByte) }),
          3 -> ((b: FBB) => b.pushRef(off))) })
    }
    val colsVec = fbb.createRefVector(colOffsets.toSeq)
    val root = fbb.table(Seq(
      1 -> ((b: FBB) => { b.prep(8, 0); b.push64(n.toLong) }),
      2 -> ((b: FBB) => b.pushRef(colsVec)),
      3 -> ((b: FBB) => { b.prep(4, 0); b.push32(2) }))) // kFeatherV1Version
    val meta = fbb.finish(root)

    out.write(meta)
    val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(meta.length)
    out.write(tail.array())
    out.write("FEA1".getBytes("ASCII"))
    Files.write(Paths.get(path), out.toByteArray)
  }
}
