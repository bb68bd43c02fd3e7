package graft

import graft.multimodal.Multimodal
import graft.operators.TextOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native ImageMeta header parsing (real container bytes, corrupt inputs)
  * and URL canonicalization edge cases. */
class ImageMetaUrlSpec extends SparkSpec {
  import spark.implicits._

  private def meta(bytes: Array[Byte]): Row = {
    val df = Seq(Tuple1(bytes)).toDF("payload")
    Multimodal.withImageMeta(df, "payload")
      .select($"img.format", $"img.width", $"img.height").head()
  }

  private def be32(v: Int) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  test("PNG IHDR dimensions") {
    val png = pngSig ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    assert(meta(png) === Row("png", 640, 480))
  }

  test("JPEG SOF0 behind APP0+DQT markers; RST-safe scan") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      // APP0 "JFIF" segment, len 16
      Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(16) ++
      "JFIF".getBytes ++ Array.fill[Byte](10)(0) ++
      // DQT, len 4 (2 payload bytes)
      Array[Byte](0xFF.toByte, 0xDB.toByte) ++ be16(4) ++ Array[Byte](0, 1) ++
      // SOF0: len 17, precision 8, height 1080, width 1920, 3 components
      Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(1080) ++ be16(1920) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(meta(jpeg) === Row("jpeg", 1920, 1080))
  }

  test("JPEG progressive (SOF2) also parses") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xC2.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(32) ++ be16(64) ++ Array.fill[Byte](10)(0)
    assert(meta(jpeg) === Row("jpeg", 64, 32))
  }

  test("GIF87a and GIF89a screen descriptor (little-endian)") {
    val gif89 = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++ Array[Byte](0, 0, 0)
    val gif87 = "GIF87a".getBytes ++ le16(1) ++ le16(65535) ++ Array[Byte](0, 0, 0)
    assert(meta(gif89) === Row("gif", 320, 200))
    assert(meta(gif87) === Row("gif", 1, 65535))
  }

  test("BMP: BITMAPINFOHEADER (negative height = top-down) and CORE header") {
    val info = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++
      le32(800) ++ le32(-600) ++ Array.fill[Byte](4)(0)
    assert(meta(info) === Row("bmp", 800, 600))
    val core = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(12) ++
      le16(100) ++ le16(50) ++ Array.fill[Byte](8)(0)
    assert(meta(core) === Row("bmp", 100, 50))
  }

  test("corrupt headers keep sniffed format with null dims; unknown magic") {
    assert(meta(pngSig ++ Array[Byte](0, 0)) === Row("png", null, null))
    assert(meta(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte))
      === Row("jpeg", null, null)) // EOI before any SOF
    assert(meta("GIF89a".getBytes) === Row("gif", null, null))
    assert(meta("BM".getBytes ++ Array.fill[Byte](10)(0)) === Row("bmp", null, null))
    assert(meta("plain text".getBytes) === Row("unknown", null, null))
    assert(meta(Array.empty[Byte]) === Row("unknown", null, null))
  }

  test("null payload yields a null struct; resolution filter prunes") {
    val rows = Seq(
      (1L, pngSig ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
        be32(1024) ++ be32(768) ++ Array[Byte](8, 2, 0, 0, 0)),
      (2L, pngSig ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
        be32(64) ++ be32(64) ++ Array[Byte](8, 2, 0, 0, 0)),
      (3L, "garbage".getBytes),
      (4L, null)).toDF("id", "payload")
    val withMeta = Multimodal.withImageMeta(rows, "payload")
    assert(withMeta.filter($"id" === 4).select($"img").head().isNullAt(0))
    val kept = Multimodal.filterByResolution(rows, "payload", 256, 256)
      .select($"id").as[Long].collect().toSeq
    assert(kept === Seq(1L)) // small, unparseable, and null all drop
  }

  test("filterByResolution parses the header once per row (plan audit)") {
    // non-local source: a local relation would be constant-folded away
    val df = spark.range(10)
      .select(encode($"id".cast("string"), "UTF-8").as("payload"))
    val plan = Multimodal.filterByResolution(df, "payload", 256, 256)
      .queryExecution.executedPlan.toString
    val parses = "graft_image".r.findAllIn(plan).length
    assert(parses === 1, s"expected one header parse in the plan, got $parses:\n$plan")
    assert(plan.contains("graft_image_min_resolution"))
  }

  // ---- AudioMeta (RIFF/WAVE) ----

  private def ameta(bytes: Array[Byte]): Row = {
    val df = Seq(Tuple1(bytes)).toDF("payload")
    Multimodal.withAudioMeta(df, "payload")
      .select($"audio.format", $"audio.channels", $"audio.sample_rate",
        $"audio.bits", $"audio.n_frames", $"audio.duration_us").head()
  }

  private def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int,
      preChunks: Array[Byte] = Array.empty, body: Boolean = true): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits)
    val data = "data".getBytes ++ le32(dataBytes) ++
      (if (body) Array.fill[Byte](dataBytes)(7) else Array.empty[Byte])
    val chunks = preChunks ++ fmt ++ data
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
  }

  test("WAV fmt+data parse: channels, rate, bits, frames, duration") {
    // 2ch 16-bit 44.1kHz, 44100 frames (1 s): blockAlign 4
    assert(ameta(wav(2, 44100, 16, 44100 * 4)) ===
      Row("wav", 2, 44100, 16, 44100L, 1000000L))
    // mono 8kHz, 80 frames = 10 ms
    assert(ameta(wav(1, 8000, 16, 80 * 2)) === Row("wav", 1, 8000, 16, 80L, 10000L))
  }

  test("WAV chunk scan skips foreign chunks and honors word alignment") {
    // odd-sized LIST chunk (size 5 -> 1 pad byte) before fmt
    val list = "LIST".getBytes ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    assert(ameta(wav(2, 16000, 16, 160 * 4, preChunks = list)) ===
      Row("wav", 2, 16000, 16, 160L, 10000L))
    // data chunk header with no body still parses (meta never reads samples)
    assert(ameta(wav(1, 8000, 16, 8000 * 2, body = false)) ===
      Row("wav", 1, 8000, 16, 8000L, 1000000L))
  }

  test("corrupt WAV keeps format with null fields; unknown magic") {
    // RIFF/WAVE but no chunks at all
    assert(ameta("RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes) ===
      Row("wav", null, null, null, null, null))
    // fmt without data
    val noData = "RIFF".getBytes ++ le32(28) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16)
    assert(ameta(noData) === Row("wav", null, null, null, null, null))
    // truncated fmt chunk
    assert(ameta("RIFF".getBytes ++ le32(12) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16)) === Row("wav", null, null, null, null, null))
    // zero sample rate is corrupt, not a divide-by-zero
    assert(ameta(wav(1, 0, 16, 100)) === Row("wav", null, null, null, null, null))
    assert(ameta("not audio".getBytes) === Row("unknown", null, null, null, null, null))
    assert(ameta(Array.empty[Byte]) === Row("unknown", null, null, null, null, null))
  }

  test("AudioPcmStats: real PCM decode, exact integer stats, never fabricated") {
    def wavPcm(channels: Int, rate: Int, samples: Array[Short],
        bits: Int = 16, fmtCode: Int = 1): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val body = samples.flatMap(s => le16(s & 0xFFFF))
      val fmt = "fmt ".getBytes ++ le32(16) ++ le16(fmtCode) ++ le16(channels) ++
        le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits)
      val data = "data".getBytes ++ le32(body.length) ++ body
      val chunks = fmt ++ data
      "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
    }
    def stats(bytes: Array[Byte]): Row = {
      val df = Seq(Tuple1(bytes)).toDF("payload")
      Multimodal.withPcmStats(df, "payload").select($"pcm").head().getAs[Row](0)
    }
    // random samples: the decode must equal a sequential model exactly
    val rnd = new scala.util.Random(0xA0D10)
    val samples = Array.fill(777)((rnd.nextInt(65536) - 32768).toShort)
    val want = (samples.length.toLong,
      samples.map(s => math.abs(s.toInt)).max,
      samples.map(s => math.abs(s.toInt).toLong).sum,
      samples.map(s => s.toLong * s).sum)
    val got = stats(wavPcm(1, 8000, samples))
    assert((got.getLong(0), got.getInt(1), got.getLong(2), got.getLong(3)) === want)
    // Short.MinValue: |−32768| = 32768 must not overflow to negative
    val edge = stats(wavPcm(2, 16000, Array[Short](Short.MinValue, 0)))
    assert(edge.getInt(1) === 32768 && edge.getLong(2) === 32768L &&
      edge.getLong(3) === 32768L * 32768L)
    // a decoder never fabricates: truncated body, odd-sized data,
    // 8-bit, non-PCM fmt code, garbage — all null
    def pcmNull(bytes: Array[Byte]): Boolean = {
      val df = Seq(Tuple1(bytes)).toDF("payload")
      Multimodal.withPcmStats(df, "payload").select($"pcm").head().isNullAt(0)
    }
    val full = wavPcm(1, 8000, samples)
    assert(pcmNull(java.util.Arrays.copyOf(full, full.length - 3)))
    val oddData = "RIFF".getBytes ++ le32(4 + 24 + 8 + 3) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16)) ++
      "data".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3)
    assert(pcmNull(oddData))
    assert(pcmNull(wavPcm(1, 8000, samples.take(4), bits = 8)))
    assert(pcmNull(wavPcm(1, 8000, samples.take(4), fmtCode = 3))) // float PCM
    assert(pcmNull("not audio at all".getBytes))
    // AudioMeta (header scan) still parses what the decoder refuses:
    // the header-only fixture decodes to null but metas fine
    assert(pcmNull(wav(1, 8000, 16, 80 * 2, body = false)))
    assert(ameta(wav(1, 8000, 16, 80 * 2, body = false)).getString(0) === "wav")
  }

  test("filterBySignal: silence floor + clipping ceiling, one decode per row") {
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val body = samples.flatMap(s => le16(s & 0xFFFF))
      val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
      val data = "data".getBytes ++ le32(body.length) ++ body
      "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++
        "WAVE".getBytes ++ fmt ++ data
    }
    val rows = Seq(
      (1L, wavOf(Array[Short](100, -100, 100, -100))),  // mean 100: keeps
      (2L, wavOf(Array[Short](1, 0, -1, 0))),           // near-silent: drops
      (3L, wavOf(Array[Short](100, 32767))),            // clipped: drops
      (4L, "garbage".getBytes)                          // undecodable: drops
    ).toDF("id", "payload")
    val kept = Multimodal.filterBySignal(rows, "payload",
        minMeanAbsMilli = 50000L, maxPeak = 30000)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L))
    // ONE decode in the plan: the gate is a single native predicate,
    // not a per-field re-decode of the stats struct. (Over spark.range —
    // a Seq.toDF LocalRelation constant-folds the whole filter away.)
    val rangeRows = spark.range(10)
      .select(encode($"id".cast("string"), "UTF-8").as("payload"))
    val plan = Multimodal.filterBySignal(rangeRows, "payload", 50000L, 30000)
      .queryExecution.executedPlan.toString
    assert("graft_audio_pcm".r.findAllIn(plan).length === 1, plan)
  }

  test("filterByDuration prunes short/corrupt/null payloads with one parse") {
    val rows = Seq(
      (1L, wav(2, 44100, 16, 44100 * 4)), // 1 s — kept at 20 ms gate
      (2L, wav(1, 8000, 16, 80 * 2)),     // 10 ms — dropped
      (3L, "garbage".getBytes),
      (4L, null)).toDF("id", "payload")
    val kept = Multimodal.filterByDuration(rows, "payload", 20000L)
      .select($"id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
    // plan audit: exactly one header parse per row
    val src = spark.range(10)
      .select(encode($"id".cast("string"), "UTF-8").as("payload"))
    val plan = Multimodal.filterByDuration(src, "payload", 20000L)
      .queryExecution.executedPlan.toString
    assert("graft_audio".r.findAllIn(plan).length === 1, plan)
    assert(plan.contains("graft_audio_min_duration"))
  }

  test("canonicalizeUrl: scheme/host case, ports, fragments, tracking params") {
    val cases = Seq(
      "HTTP://Site.Example.COM:80/Path/?utm_source=x&q=1#frag" ->
        "http://site.example.com/Path/?q=1",
      "https://cdn.example.com:443/img?fbclid=abc" ->
        "https://cdn.example.com/img",
      "http://a.example.org/p/" -> "http://a.example.org/p",
      "http://a.example.org/" -> "http://a.example.org",
      // tracker mid-list and at end; non-tracker params keep order
      "http://h/x?a=1&utm_campaign=c&b=2" -> "http://h/x?a=1&b=2",
      "http://h/x?a=1&gclid=g" -> "http://h/x?a=1",
      "http://h/x?utm_a=1&utm_b=2&c=3" -> "http://h/x?c=3",
      "http://h/x?utm_only=1" -> "http://h/x",
      // param whose NAME merely starts with a tracker name survives
      "http://h/x?refresh=1" -> "http://h/x?refresh=1",
      // literal & in the path is never promoted to '?'
      "http://h/a&b?utm_x=1" -> "http://h/a&b",
      // non-default port kept; path case kept
      "http://h:8080/A" -> "http://h:8080/A",
      // a trailing slash inside a QUERY VALUE is data, not path — kept
      "http://h/x?next=/home/" -> "http://h/x?next=/home/",
      // non-URL text passes through
      "not a url" -> "not a url")
    val df = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalizeUrl($"url").as("c"))
    assert(df.as[String].collect().toSeq === cases.map(_._2))
  }
}
