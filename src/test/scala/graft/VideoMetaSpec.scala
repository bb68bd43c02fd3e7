package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Native VideoMeta ISO-BMFF box parsing (v0/v1 headers, largesize/co64
  * 64-bit paths, corrupt inputs), the single-parse clip gate, and the
  * sample-table-driven frame sampler. */
object VideoSynth extends Serializable {
  def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  def be32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  def ftyp(brand: String = "isom") =
    box("ftyp", brand.getBytes ++ be32(0x200L) ++ "mp41".getBytes)

  val matrix = be32(0x10000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)

  def mvhd0(ts: Int, dur: Long) =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts.toLong) ++ be32(dur) ++
      be32(0x10000L) ++ be16(0x100) ++ be16(0) ++ be64(0) ++ matrix ++
      Array.fill[Byte](24)(0) ++ be32(2))

  def mvhd1(ts: Int, dur: Long) =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(ts.toLong) ++ be64(dur) ++
      be32(0x10000L) ++ be16(0x100) ++ be16(0) ++ be64(0) ++ matrix ++
      Array.fill[Byte](24)(0) ++ be32(2))

  def tkhd0(w: Int, h: Int, dur: Long) =
    box("tkhd", be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
      be32(dur) ++ be64(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      matrix ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))

  def tkhd1(w: Int, h: Int, dur: Long) =
    box("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++ be32(1) ++
      be32(0) ++ be64(dur) ++ be64(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      be16(0) ++ matrix ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))

  def stbl(nf: Long, delta: Int, ss: Int, chunkOff: Long,
      co64: Boolean = false, gop: Int = 0) = {
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(nf) ++ be32(delta.toLong))
    val stsz = box("stsz", be32(0) ++ be32(ss.toLong) ++ be32(nf))
    val stco =
      if (co64) box("co64", be32(0) ++ be32(1) ++ be64(chunkOff))
      else box("stco", be32(0) ++ be32(1) ++ be32(chunkOff))
    val stss =
      if (gop <= 0) Array.empty[Byte]
      else {
        val syncs = (1L to nf by gop.toLong).toArray // 1-based sample numbers
        box("stss", be32(0) ++ be32(syncs.length.toLong) ++
          syncs.flatMap(be32))
      }
    box("stbl", stts ++ stsz ++ stco ++ stss)
  }

  def mdhd0(ts: Int) =
    box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts.toLong) ++ be32(0) ++
      be16(0x55C4) ++ be16(0))

  def hdlr(handlerType: String) =
    box("hdlr", be32(0) ++ be32(0) ++ handlerType.getBytes("US-ASCII") ++
      Array.fill[Byte](12)(0) :+ 0.toByte)

  def trak(tkhd: Array[Byte], st: Array[Byte], mediaTs: Int = 0,
      handler: String = "") =
    box("trak", tkhd ++ box("mdia",
      (if (mediaTs > 0) mdhd0(mediaTs) else Array.empty[Byte]) ++
        (if (handler.nonEmpty) hdlr(handler) else Array.empty[Byte]) ++
        box("minf", st)))

  /** An audio-like trak: tkhd with ZERO dims plus its own sample tables
    * (the decoy an audio-first muxed file places before the video trak). */
  def audioTrak(nSamples: Long, ss: Int) =
    trak(tkhd0(0, 0, nSamples), stbl(nSamples, 1024, ss, chunkOff = 4444))

  /** stbl whose stco is pre-set to 0 for later patching via
    * [[patchChunkOffset]] (fixture builders that append mdat last). */
  def patchedStbl(nf: Long, delta: Int, ss: Int) =
    stbl(nf, delta, ss, chunkOff = 0)

  /** stbl with a MULTI-entry stco — the interleaved-chunk layout the
    * addressability gate must reject. */
  def stblMultiChunk(nf: Long, delta: Int, ss: Int, offsets: Seq[Long]) = {
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(nf) ++ be32(delta.toLong))
    val stsz = box("stsz", be32(0) ++ be32(ss.toLong) ++ be32(nf))
    val stco = box("stco", be32(0) ++ be32(offsets.length.toLong) ++
      offsets.toArray.flatMap(be32))
    box("stbl", stts ++ stsz ++ stco)
  }

  def mp4(ts: Int = 24000, nf: Long = 100, delta: Int = 1000,
      w: Int = 640, h: Int = 480, ss: Int = 900,
      v1: Boolean = false, co64: Boolean = false,
      largesizeMdat: Boolean = false, gop: Int = 0): Array[Byte] = {
    val dur = nf * delta
    val head = ftyp() ++ box("moov",
      (if (v1) mvhd1(ts, dur) else mvhd0(ts, dur)) ++
        trak(if (v1) tkhd1(w, h, dur) else tkhd0(w, h, dur),
          stbl(nf, delta, ss, chunkOff = 0, co64 = co64, gop = gop)))
    // header-only mdat: declared payload, no body (parser never reads it)
    val mdatHdr =
      if (largesizeMdat) be32(1) ++ "mdat".getBytes ++ be64(16L + nf * ss)
      else be32(8L + nf * ss) ++ "mdat".getBytes
    // fix the chunk offset now that the header length is known
    val bytes = head ++ mdatHdr
    val coff = bytes.length.toLong
    patchChunkOffset(bytes, coff, co64)
  }

  /** Rewrite the stco/co64 first entry in place (test helper: the synth
    * builds head-first, so the data offset is only known at the end). */
  def patchChunkOffset(b: Array[Byte], off: Long, co64: Boolean): Array[Byte] = {
    val tag = if (co64) "co64" else "stco"
    val idx = b.sliding(4).indexWhere(_.sameElements(tag.getBytes))
    require(idx > 0, "no chunk-offset box found")
    val at = idx + 4 + 8 // past type, verflags, entry_count
    val enc = if (co64) be64(off) else be32(off)
    val out = b.clone()
    System.arraycopy(enc, 0, out, at, enc.length)
    out
  }
}

/** Native VideoMeta box parsing over [[VideoSynth]] containers. */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._
  import VideoSynth._

  private def meta(bytes: Array[Byte]): Row = {
    val df = Seq(Tuple1(bytes)).toDF("payload")
    Multimodal.withVideoMeta(df, "payload").select(
      $"video.format", $"video.timescale", $"video.duration_ticks",
      $"video.duration_us", $"video.width", $"video.height",
      $"video.n_tracks", $"video.n_frames", $"video.frame_delta",
      $"video.sample_size", $"video.chunk_offset", $"video.mdat_size").head()
  }

  test("MP4 v0 box walk: brand, mvhd, tkhd dims, sample tables, mdat") {
    val b = mp4(ts = 24000, nf = 100, delta = 1000, w = 640, h = 480, ss = 900)
    val m = meta(b)
    // chunk offset = where the (absent) mdat body would start = total
    // header length = the whole buffer, since bodies are never written
    assert(m === Row("isom", 24000, 100000L, 100000L * 1000000L / 24000L,
      640, 480, 1, 100L, 1000, 900, b.length.toLong, 90000L))
  }

  test("v1 (64-bit) mvhd/tkhd, co64 chunk offsets, largesize mdat") {
    val b = mp4(ts = 90000, nf = 50, delta = 3000, w = 1920, h = 1080,
      ss = 4000, v1 = true, co64 = true, largesizeMdat = true)
    val m = meta(b)
    assert(m.getString(0) === "isom")
    assert(m.getInt(1) === 90000)
    assert(m.getLong(2) === 150000L)
    assert(m.getLong(3) === 150000L * 1000000L / 90000L)
    assert((m.getInt(4), m.getInt(5)) === ((1920, 1080)))
    assert(m.getLong(7) === 50L)
    assert(m.getInt(8) === 3000)
    assert(m.getInt(9) === 4000)
    assert(m.getLong(10) === b.length.toLong)
    assert(m.getLong(11) === 200000L)
  }

  test("corrupt layouts keep brand with nulls; unknown magic; foreign boxes skip") {
    // truncated moov (declared size overruns the buffer)
    val trunc = ftyp() ++ be32(500) ++ "moov".getBytes ++ Array.fill[Byte](20)(0)
    assert(meta(trunc) === Row("isom", null, null, null, null, null, null,
      null, null, null, null, null))
    // child box overruns its parent
    val badChild = ftyp() ++ box("moov", be32(9999) ++ "mvhd".getBytes ++ be32(0))
    assert(meta(badChild) === Row("isom", null, null, null, null, null, null,
      null, null, null, null, null))
    // not BMFF at all
    assert(meta("not a video".getBytes).getString(0) === "unknown")
    // ftyp alone: brand parses, structural fields stay null (n_tracks too —
    // no moov means "tracks unknown", not zero)
    assert(meta(ftyp("mp42")) === Row("mp42", null, null, null, null, null,
      null, null, null, null, null, null))
    // unrecognized sibling boxes are skipped, not fatal
    val withFree = ftyp() ++ box("free", Array.fill[Byte](11)(3)) ++
      mp4().drop(ftyp().length)
    assert(meta(withFree).getLong(7) === 100L)
  }

  test("single-parse clip gate == composed post-parse filter (differential)") {
    // built over Range (not a LocalRelation, which Catalyst would fold
    // through the filter at optimize time, leaving no plan to audit)
    val mk = udf { id: Long =>
      mp4(ts = (24 + (id % 3) * 3).toInt * 1000, nf = id % 240 + 1,
        w = (320 + (id % 4) * 160).toInt, h = (240 + (id % 3) * 120).toInt)
    }
    val df = spark.range(200).select($"id".as("doc_id"), mk($"id").as("payload"))
    val gated = Multimodal.filterByVideo(df, "payload", 5000000L, 480, 360)
      .select("doc_id").as[Long].collect().sorted
    val composed = Multimodal.withVideoMeta(df, "payload")
      .where($"video.duration_us" >= 5000000L &&
        $"video.width" >= 480 && $"video.height" >= 360)
      .select("doc_id").as[Long].collect().sorted
    assert(gated.sameElements(composed))
    assert(gated.nonEmpty && gated.length < 200)
    // one box walk in the gate's plan, not one per meta field
    val plan = Multimodal.filterByVideo(df, "payload", 5000000L, 480, 360)
      .queryExecution.executedPlan.toString
    assert("graft_video".r.findAllIn(plan).length === 1, plan)
  }

  test("frame sampler: container-table-driven (pts, byte-range) list") {
    val b = mp4(ts = 24000, nf = 100, delta = 1000, ss = 900)
    val df = Seq((1L, b)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrameRanges(df, "payload", 8)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.pts_us", $"f.byte_offset", $"f.byte_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(frames.map(_._1).toSeq === Seq(0L, 12L, 25L, 37L, 50L, 62L, 75L, 87L))
    frames.foreach { case (idx, pts, off, len) =>
      assert(pts === idx * 1000L * 1000000L / 24000L)
      assert(off === meta(b).getLong(10) + idx * 900L)
      assert(len === 900L)
    }
    // clips shorter than k yield each frame exactly once
    val short = Seq((2L, mp4(nf = 3, ss = 100))).toDF("doc_id", "payload")
    val sf = Multimodal.sampleFrameRanges(short, "payload", 8)
      .select(explode($"frames").as("f")).select($"f.frame_idx")
      .as[Long].collect().sorted
    assert(sf.toSeq === Seq(0L, 1L, 2L))
    // rows without addressable sample tables drop (can't schedule reads)
    val noTables = Seq((3L, ftyp())).toDF("doc_id", "payload")
    assert(Multimodal.sampleFrameRanges(noTables, "payload", 8).count() === 0)
  }

  test("stss sync samples parse 0-based; snapping moves reads to keyframes") {
    import graft.expr.BinaryExpressions
    // stss entries 1, 9, 17, 25 (1-based) -> 0-based frame indices
    val withKeys = mp4(nf = 25, gop = 8)
    val keys = Seq(Tuple1(withKeys)).toDF("payload")
      .select(BinaryExpressions.videoSyncSamples($"payload").as("k"))
      .head().getSeq[Long](0)
    assert(keys === Seq(0L, 8L, 16L, 24L))
    // no stss -> null (ISO: absence means every sample is sync)
    assert(Seq(Tuple1(mp4())).toDF("payload")
      .select(BinaryExpressions.videoSyncSamples($"payload").as("k"))
      .head().isNullAt(0))

    // snapping: uniform indices floor(j*100/8) land on the gop-12 grid
    val clip = mp4(nf = 100, gop = 12, ss = 900)
    val df = Seq((1L, clip)).toDF("doc_id", "payload")
    val snapped = Multimodal.sampleFrameRanges(df, "payload", 8,
        snapToKeyframes = true)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.byte_offset").as[(Long, Long)]
      .collect().sortBy(_._1)
    // uniform 0,12,25,37,50,62,75,87 -> snapped 0,12,24,36,48,60,72,84
    assert(snapped.map(_._1).toSeq === Seq(0L, 12L, 24L, 36L, 48L, 60L, 72L, 84L))
    val coff = meta(clip).getLong(10)
    snapped.foreach { case (idx, off) => assert(off === coff + idx * 900L) }
    // without stss, snapToKeyframes is a no-op (null keys -> raw indices)
    val plain = Seq((1L, mp4(nf = 100))).toDF("doc_id", "payload")
    val a = Multimodal.sampleFrameRanges(plain, "payload", 8, snapToKeyframes = true)
      .select(explode($"frames").as("f")).select($"f.frame_idx")
      .as[Long].collect().sorted.toSeq
    val b = Multimodal.sampleFrameRanges(plain, "payload", 8)
      .select(explode($"frames").as("f")).select($"f.frame_idx")
      .as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("real-MP4 shapes: audio-first trak selection, mdhd media pts, multi-chunk gate") {
    import graft.expr.BinaryExpressions
    def metaAll(bytes: Array[Byte]): Row = {
      val df = Seq(Tuple1(bytes)).toDF("payload")
      Multimodal.withVideoMeta(df, "payload").select(
        $"video.width", $"video.height", $"video.n_frames",
        $"video.sample_size", $"video.chunk_offset",
        $"video.media_timescale", $"video.n_chunks", $"video.n_tracks").head()
    }
    // audio-first file: audio trak (zero dims, its own big sample tables)
    // BEFORE the video trak — dims AND sample tables must come from the
    // VIDEO trak, never mixed across traks
    val audioFirst = ftyp() ++ box("moov",
      mvhd0(1000, 4000) ++
        audioTrak(nSamples = 216000, ss = 128) ++
        trak(tkhd0(640, 480, 4000), stbl(96, 512, 900, chunkOff = 332),
          mediaTs = 15360))
    val m = metaAll(audioFirst)
    assert((m.getInt(0), m.getInt(1)) === ((640, 480)))
    assert(m.getLong(2) === 96L)     // video frames, not 216000 audio samples
    assert(m.getInt(3) === 900)      // video sample size, not 128
    assert(m.getLong(4) === 332L)    // video chunk offset, not 4444
    assert(m.getInt(5) === 15360)    // the video trak's MEDIA timescale
    assert(m.getInt(7) === 2)
    // stss selection follows the same rule: the audio trak has no stss,
    // the video trak's must still be found
    val audioFirstKeys = ftyp() ++ box("moov",
      mvhd0(1000, 4000) ++
        audioTrak(nSamples = 1000, ss = 128) ++
        trak(tkhd0(320, 240, 4000), stbl(48, 512, 900, 0, gop = 12)))
    val keys = Seq(Tuple1(audioFirstKeys)).toDF("payload")
      .select(BinaryExpressions.videoSyncSamples($"payload").as("k"))
      .head().getSeq[Long](0)
    assert(keys === Seq(0L, 12L, 24L, 36L))
    // pts arithmetic divides by MEDIA ticks when mdhd is present:
    // delta 512 @ media 15360 = 33,333 us/frame (mvhd 1000 would say 512ms)
    val clip = ftyp() ++ box("moov",
      mvhd0(1000, 4000) ++
        trak(tkhd0(640, 480, 4000),
          VideoSynth.patchedStbl(96, 512, 900), mediaTs = 15360)) ++
      (be32(8L + 96 * 900) ++ "mdat".getBytes)
    val patched = patchChunkOffset(clip, clip.length.toLong, co64 = false)
    val pts = Multimodal.sampleFrameRanges(
        Seq((1L, patched)).toDF("doc_id", "payload"), "payload", 4)
      .select(explode($"frames").as("f")).select($"f.frame_idx", $"f.pts_us")
      .as[(Long, Long)].collect().sortBy(_._1)
    pts.foreach { case (idx, p) => assert(p === idx * 512L * 1000000L / 15360L) }
    // a multi-chunk layout fails the addressability gate: offset+idx*size
    // would read other chunks' bytes as frames
    val multiChunk = ftyp() ++ box("moov",
      mvhd0(1000, 4000) ++
        trak(tkhd0(640, 480, 4000),
          VideoSynth.stblMultiChunk(96, 512, 900, Seq(332L, 99000L))))
    assert(!BinaryExpressions.videoSampleable(multiChunk))
    assert(Multimodal.sampleFrameRanges(
      Seq((1L, multiChunk)).toDF("doc_id", "payload"), "payload", 4).count() === 0)
  }

  test("native full-addressing sampler: stsc chunks, multi-entry stts, variable stsz") {
    import graft.expr.BinaryExpressions
    def ranges(bytes: Array[Byte], k: Int, snap: Boolean = false) = {
      val r = BinaryExpressions.videoFrameRanges(bytes, k, snap)
      if (r == null) null
      else (0 until r.numElements()).map { i =>
        val row = r.getStruct(i, 4)
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      }
    }
    // differential vs the column sampler on the simple single-chunk layout
    val simple = mp4(ts = 24000, nf = 100, delta = 1000, ss = 900)
    val viaCols = Multimodal.sampleFrameRanges(
        Seq((1L, simple)).toDF("doc_id", "payload"), "payload", 8)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.pts_us", $"f.byte_offset", $"f.byte_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ranges(simple, 8) === viaCols)
    // and the keyframe-snapped variants agree too
    val snapped = mp4(nf = 100, gop = 12, ss = 900)
    val viaColsSnap = Multimodal.sampleFrameRanges(
        Seq((1L, snapped)).toDF("doc_id", "payload"), "payload", 8,
        snapToKeyframes = true)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.pts_us", $"f.byte_offset", $"f.byte_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ranges(snapped, 8, snap = true) === viaColsSnap)

    // multi-entry stts: 3 frames at delta 100 then 3 at delta 500 —
    // pts is the CUMULATIVE sum, media timescale 1000 -> us = ticks*1000
    val stts2 = box("stts", be32(0) ++ be32(2) ++
      be32(3) ++ be32(100) ++ be32(3) ++ be32(500))
    val stsz6 = box("stsz", be32(0) ++ be32(10) ++ be32(6))
    val stco1 = box("stco", be32(0) ++ be32(1) ++ be32(0))
    val multiStts = patchChunkOffset(
      ftyp() ++ box("moov", mvhd0(1000, 2100) ++
        trak(tkhd0(64, 48, 2100), box("stbl", stts2 ++ stsz6 ++ stco1))),
      0, co64 = false)
    val ptsAll = ranges(multiStts, 6).map(r => r._1 -> r._2).toMap
    assert(ptsAll === Map(0L -> 0L, 1L -> 100000L, 2L -> 200000L,
      3L -> 300000L, 4L -> 800000L, 5L -> 1300000L))

    // variable stsz: per-sample sizes accumulate into offsets and lengths
    val sizes = Seq(10L, 20L, 30L, 40L)
    val stszVar = box("stsz", be32(0) ++ be32(0) ++ be32(4) ++
      sizes.toArray.flatMap(be32))
    val stts4 = box("stts", be32(0) ++ be32(1) ++ be32(4) ++ be32(100))
    val stcoAt = box("stco", be32(0) ++ be32(1) ++ be32(1000))
    val varSz = ftyp() ++ box("moov", mvhd0(1000, 400) ++
      trak(tkhd0(64, 48, 400), box("stbl", stts4 ++ stszVar ++ stcoAt)))
    val got = ranges(varSz, 4)
    assert(got === Seq((0L, 0L, 1000L, 10L), (1L, 100000L, 1010L, 20L),
      (2L, 200000L, 1030L, 30L), (3L, 300000L, 1060L, 40L)))

    // stsc chunk mapping: 2 samples/chunk over chunks at 100 and 900 —
    // sample 2 starts chunk 1 at offset 900, NOT 100 + 2*10
    val stsc2 = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val stco2 = box("stco", be32(0) ++ be32(2) ++ be32(100) ++ be32(900))
    val stszF = box("stsz", be32(0) ++ be32(10) ++ be32(4))
    val chunked = ftyp() ++ box("moov", mvhd0(1000, 400) ++
      trak(tkhd0(64, 48, 400), box("stbl", stts4 ++ stszF ++ stsc2 ++ stco2)))
    assert(ranges(chunked, 4).map(r => r._1 -> r._3) ===
      Seq(0L -> 100L, 1L -> 110L, 2L -> 900L, 3L -> 910L))
    // multi-chunk WITHOUT stsc is unaddressable -> null, never a guess
    val noStsc = ftyp() ++ box("moov", mvhd0(1000, 400) ++
      trak(tkhd0(64, 48, 400), box("stbl", stts4 ++ stszF ++ stco2)))
    assert(ranges(noStsc, 4) === null)
  }

  test("gate consolidation: native addressability strictly extends the column gate") {
    // the production entry is sampleFrameRangesFull — gate = "the table
    // walk PROVED an address for every sampled frame" (ranges non-null).
    // The column face's single-chunk gate is the ORACLE-replayable
    // subset; this spec pins the role split: gate implication (column ⊆
    // native), equal results on the shared rows, and the unprovable
    // layouts (multi-chunk without stsc, garbage) rejected by BOTH.
    val simple = mp4(ts = 24000, nf = 100, delta = 1000, ss = 900)
    val stts4 = box("stts", be32(0) ++ be32(1) ++ be32(4) ++ be32(100))
    val stszF = box("stsz", be32(0) ++ be32(10) ++ be32(4))
    val stsc2 = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val stco2 = box("stco", be32(0) ++ be32(2) ++ be32(100) ++ be32(900))
    val chunked = ftyp() ++ box("moov", mvhd0(1000, 400) ++
      trak(tkhd0(64, 48, 400), box("stbl", stts4 ++ stszF ++ stsc2 ++ stco2)))
    val noStsc = ftyp() ++ box("moov", mvhd0(1000, 400) ++
      trak(tkhd0(64, 48, 400), box("stbl", stts4 ++ stszF ++ stco2)))
    val junk = Array.fill[Byte](64)(33)
    val corpus = Seq((1L, simple), (2L, chunked), (3L, noStsc), (4L, junk))
      .toDF("doc_id", "payload")
    def flat(df: org.apache.spark.sql.DataFrame, id: Long) = df
      .filter($"doc_id" === id).select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.pts_us", $"f.byte_offset", $"f.byte_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaCols = Multimodal.sampleFrameRanges(corpus, "payload", 4)
    assert(viaCols.select("doc_id").as[Long].collect().toSeq === Seq(1L),
      "column gate admits exactly the single-chunk layout")
    val viaFull = Multimodal.sampleFrameRangesFull(corpus, "payload", 4)
    assert(viaFull.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "native gate adds the stsc-addressable layout, still rejects unprovable")
    assert(flat(viaFull, 1L) === flat(viaCols, 1L),
      "shared rows: native == column, range for range")
    assert(flat(viaFull, 2L).map(r => r._1 -> r._3) ===
      Seq(0L -> 100L, 1L -> 110L, 2L -> 900L, 3L -> 910L),
      "the added row is addressed through stsc, not offset+idx*size")
  }

  test("hdlr handler_type beats the dims heuristic for track selection") {
    // a decoy audio trak carrying BOGUS nonzero dims (broken muxer) but
    // hdlr 'soun' - only the spec-exact hdlr rule avoids it
    val decoy = ftyp() ++ box("moov", mvhd0(1000, 4000) ++
      trak(tkhd0(999, 999, 4000), stbl(216000, 1024, 128, chunkOff = 4444),
        handler = "soun") ++
      trak(tkhd0(640, 480, 4000), stbl(96, 512, 900, chunkOff = 332),
        handler = "vide"))
    val m = Multimodal.withVideoMeta(
        Seq(Tuple1(decoy)).toDF("payload"), "payload")
      .select($"video.width", $"video.n_frames", $"video.sample_size").head()
    assert((m.getInt(0), m.getLong(1), m.getInt(2)) === ((640, 96L, 900)))
    // headers WITHOUT hdlr keep the dims-heuristic behavior (regression)
    val noHdlr = ftyp() ++ box("moov", mvhd0(1000, 4000) ++
      audioTrak(1000, 128) ++
      trak(tkhd0(320, 240, 4000), stbl(48, 512, 900, 0)))
    val m2 = Multimodal.withVideoMeta(
        Seq(Tuple1(noHdlr)).toDF("payload"), "payload")
      .select($"video.width", $"video.n_frames").head()
    assert((m2.getInt(0), m2.getLong(1)) === ((320, 48L)))
  }

  test("fuzz: random and bit-flipped containers never throw (crawl bytes are data)") {
    import graft.expr.BinaryExpressions
    val rnd = new scala.util.Random(0xC0FFEE)
    // pure-random buffers of every small size
    (0 until 400).foreach { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b)
      BinaryExpressions.videoMeta(b)
      BinaryExpressions.videoSyncSamples(b)
      BinaryExpressions.videoAtLeast(b, 1L, 1, 1)
      BinaryExpressions.videoSampleable(b)
      BinaryExpressions.videoFrameRanges(b, 4, true)
    }
    // structured fuzz: a VALID container with every byte position mutated
    // (size fields, 4ccs, counts — each lands somewhere adversarial)
    val base = mp4(nf = 25, gop = 8, v1 = false)
    base.indices.foreach { i =>
      (1 to 3).foreach { _ =>
        val bad = base.clone(); bad(i) = (rnd.nextInt(256) - 128).toByte
        BinaryExpressions.videoMeta(bad)
        BinaryExpressions.videoSyncSamples(bad)
        BinaryExpressions.videoSampleable(bad)
        BinaryExpressions.videoFrameRanges(bad, 4, true)
      }
    }
    // truncations at every length
    base.indices.foreach { n =>
      val cut = java.util.Arrays.copyOf(base, n)
      BinaryExpressions.videoMeta(cut)
      BinaryExpressions.videoSyncSamples(cut)
    }
  }

  test("graft_video_meta SQL surface") {
    GraftFunctions.register(spark)
    Seq(Tuple1(mp4(nf = 42))).toDF("payload").createOrReplaceTempView("vids")
    val r = spark.sql(
      "SELECT graft_video_meta(payload).n_frames AS nf FROM vids").head()
    assert(r.getLong(0) === 42L)
    // and the full-addressing sampler rides the SQL surface too
    val fr = spark.sql(
      "SELECT f.frame_idx AS i FROM vids " +
        "LATERAL VIEW explode(graft_video_frame_ranges(payload, 4, false)) t AS f")
      .collect().map(_.getLong(0)).sorted
    assert(fr.toSeq === Seq(0L, 10L, 21L, 31L))
  }
}
