package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native binary-payload expressions for the multimodal pipeline.
  *
  * Image METADATA (container format + pixel dimensions) lives in the first
  * few hundred bytes of the payload — extracting it must not require a
  * decode (the container ships no codecs, and at 100 TB a resolution
  * filter that decodes every image is the wrong plan). `ImageMeta` parses
  * the four dominant container headers (PNG, JPEG, GIF, BMP) in a tight
  * byte loop inside whole-stage codegen, so `width >= 256 AND height >=
  * 256` is a narrow scan-side predicate that prunes payloads BEFORE any
  * decode stage — the same pushdown story as Multimodal.centerCrop /
  * sampleFrames.
  *
  * Reference scope note: the reference engine has no binary/image surface
  * at all; this is part of the beyond-reference training-data layer. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))
  override def prettyName: String = "graft_image_meta"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    BinaryExpressions.imageMeta(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.BinaryExpressions.imageMeta($s);")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** Single-parse resolution predicate: `width >= minW AND height >= minH`
  * with ONE header scan. A composed `meta.width >= w AND meta.height >= h`
  * predicate re-instantiates the parse per field reference once the
  * optimizer pushes it into a Filter (FilterExec has no subexpression
  * elimination — plan-audited in ImageMetaUrlSpec); this keeps the gate a
  * single byte-loop per row. Null / unparseable payloads are false. */
case class ImageMinResolution(child: Expression, minW: Int, minH: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_image_min_resolution"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && BinaryExpressions.imageAtLeast(
      v.asInstanceOf[Array[Byte]], minW, minH)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code = childGen.code.toString +
      s"""
         |boolean ${ev.value} = !${childGen.isNull} &&
         |  graft.expr.BinaryExpressions.imageAtLeast(${childGen.value}, $minW, $minH);
       """.stripMargin
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMinResolution =
    copy(child = newChild)
}

/** Audio-container metadata (RIFF/WAVE) from the payload's HEADER bytes —
  * the audio face of [[ImageMeta]]: channels / sample rate / bit depth /
  * frame count / duration without decoding a single sample, so the
  * "drop clips shorter than N ms, resample-rate gate" every audio
  * pipeline starts with is a narrow codegen'd scan-side predicate.
  * Corrupt chunk layouts keep format "wav" with null fields (the ingest
  * audit signal); non-RIFF payloads are ("unknown", null…). */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_us", LongType, nullable = true)))
  override def prettyName: String = "graft_audio_meta"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    BinaryExpressions.audioMeta(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.BinaryExpressions.audioMeta($s);")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

/** Single-parse duration predicate: `duration_us >= minUs` with ONE
  * header scan (same rationale as [[ImageMinResolution]] — FilterExec has
  * no subexpression elimination, so a composed meta.duration_us >= x
  * would re-parse per field). Null / unparseable payloads are false. */
case class AudioMinDuration(child: Expression, minUs: Long)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_audio_min_duration"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && BinaryExpressions.audioAtLeast(v.asInstanceOf[Array[Byte]], minUs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code = childGen.code.toString +
      s"""
         |boolean ${ev.value} = !${childGen.isNull} &&
         |  graft.expr.BinaryExpressions.audioAtLeast(${childGen.value}, ${minUs}L);
       """.stripMargin
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(code)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioMinDuration =
    copy(child = newChild)
}

object BinaryExpressions {

  def imageMeta(c: Column): Column = Bridge.column(ImageMeta(Bridge.expression(c)))

  def audioMeta(c: Column): Column = Bridge.column(AudioMeta(Bridge.expression(c)))

  def audioMinDuration(c: Column, minUs: Long): Column =
    Bridge.column(AudioMinDuration(Bridge.expression(c), minUs))

  def imageMinResolution(c: Column, minW: Int, minH: Int): Column =
    Bridge.column(ImageMinResolution(Bridge.expression(c), minW, minH))

  /** Static helper shared by eval and generated code. */
  def imageAtLeast(b: Array[Byte], minW: Int, minH: Int): Boolean = {
    val m = imageMeta(b)
    !m.isNullAt(1) && m.getInt(1) >= minW && m.getInt(2) >= minH
  }

  private val FmtPng = UTF8String.fromString("png")
  private val FmtJpeg = UTF8String.fromString("jpeg")
  private val FmtGif = UTF8String.fromString("gif")
  private val FmtBmp = UTF8String.fromString("bmp")
  private val FmtUnknown = UTF8String.fromString("unknown")

  private def row(fmt: UTF8String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Shared by eval and generated code: sniff the container from its magic
    * bytes and read the dimensions from the header. A payload whose magic
    * matches but whose header is truncated/corrupt keeps the sniffed
    * format with null dimensions (the audit signal "claims PNG, header
    * unreadable" matters at ingest); unrecognized payloads are
    * ("unknown", null, null). Never throws — corrupt bytes are data, not
    * errors, in a crawl. */
  def imageMeta(b: Array[Byte]): InternalRow = {
    val n = b.length
    // PNG: 8-byte signature, then IHDR chunk: len(4) "IHDR"(4) width(BE4) height(BE4)
    if (n >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A && (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A) {
      if (n >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0) return row(FmtPng, w, h)
      }
      return row(FmtPng, null, null)
    }
    // GIF87a / GIF89a: logical screen width/height, LE16 at 6/8
    if (n >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (n >= 10) {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) return row(FmtGif, w, h)
      }
      return row(FmtGif, null, null)
    }
    // BMP: "BM"; DIB header size at 14 picks the layout — BITMAPCOREHEADER
    // (12: LE16 dims at 18/20) vs BITMAPINFOHEADER+ (LE32 at 18/22; height
    // may be negative for top-down rows)
    if (n >= 2 && b(0) == 'B' && b(1) == 'M') {
      if (n >= 26) {
        val dib = le32(b, 14)
        // non-positive dims = corrupt header -> null dims (height may be
        // legitimately negative: top-down row order; width may not)
        if (dib == 12) {
          val w = le16(b, 18); val h = le16(b, 20)
          if (w > 0 && h > 0) return row(FmtBmp, w, h)
        } else if (dib >= 40) {
          val w = le32(b, 18); val h = math.abs(le32(b, 22))
          if (w > 0 && h > 0) return row(FmtBmp, w, h)
        }
      }
      return row(FmtBmp, null, null)
    }
    // JPEG: FF D8, then marker segments; dimensions live in the first SOFn
    // (C0-CF except C4=DHT, C8=JPG-extension, CC=DAC): [len][precision]
    // [height BE16][width BE16]
    if (n >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 3 < n) {
        if ((b(i) & 0xFF) != 0xFF) return row(FmtJpeg, null, null) // desynced
        // skip fill bytes (FF padding before a marker)
        var j = i
        while (j < n && (b(j) & 0xFF) == 0xFF) j += 1
        if (j >= n) return row(FmtJpeg, null, null)
        val marker = b(j) & 0xFF
        if (marker == 0xD9 || marker == 0xDA) return row(FmtJpeg, null, null) // EOI/SOS before SOF
        if (marker >= 0xD0 && marker <= 0xD7) { i = j + 1 } // standalone RSTn
        else {
          if (j + 2 >= n) return row(FmtJpeg, null, null)
          val len = be16(b, j + 1)
          if (len < 2) return row(FmtJpeg, null, null)
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (j + 8 <= n) { // dims end at j+7 inclusive
              val w = be16(b, j + 6); val h = be16(b, j + 4)
              if (w > 0 && h > 0) return row(FmtJpeg, w, h)
            }
            return row(FmtJpeg, null, null)
          }
          i = j + 1 + len
        }
      }
      return row(FmtJpeg, null, null)
    }
    row(FmtUnknown, null, null)
  }

  private val FmtWav = UTF8String.fromString("wav")

  private def audioRow(fmt: UTF8String, ch: Any, rate: Any, bits: Any,
      frames: Any, durUs: Any): InternalRow =
    new GenericInternalRow(Array[Any](fmt, ch, rate, bits, frames, durUs))

  /** Shared by eval and generated code. */
  def audioAtLeast(b: Array[Byte], minUs: Long): Boolean = {
    val m = audioMeta(b)
    !m.isNullAt(5) && m.getLong(5) >= minUs
  }

  /** RIFF/WAVE header parse — chunk scan for "fmt " (channels LE16,
    * sample rate LE32, bits LE16, block align LE16) and "data" (payload
    * size LE32); frames = dataSize / blockAlign, duration_us =
    * frames · 10⁶ / rate (floor). Chunks are word-aligned (odd sizes
    * carry a pad byte). The scan stops at the data chunk HEADER — sample
    * bytes are never touched, truncated bodies don't matter. Corrupt
    * layouts (no fmt/data chunk, zero rate/align, nonsensical sizes)
    * keep format "wav" with null fields; non-RIFF-WAVE payloads are
    * ("unknown", null…). Never throws — corrupt bytes are data, not
    * errors, in a crawl. */
  def audioMeta(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return audioRow(FmtUnknown, null, null, null, null, null)
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= n && dataSize < 0) {
      val size = le32(b, i + 4).toLong & 0xFFFFFFFFL
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > n)
          return audioRow(FmtWav, null, null, null, null, null)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataSize = size // header only — never read the sample bytes
      }
      if (size > Int.MaxValue - 16) // absurd chunk size: corrupt header
        return audioRow(FmtWav, null, null, null, null, null)
      i += 8 + size.toInt + (size.toInt & 1) // word-aligned chunks
    }
    if (channels <= 0 || rate <= 0 || blockAlign <= 0 || dataSize < 0)
      return audioRow(FmtWav, null, null, null, null, null)
    val frames = dataSize / blockAlign
    val durUs = frames * 1000000L / rate
    audioRow(FmtWav, channels, rate, bits, frames, durUs)
  }
}
