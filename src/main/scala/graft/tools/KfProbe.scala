package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KfProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.range(50000).select(col("id").as("doc_id"))
    val m = graft.queries.PipelineQueries.kfProbeSynth(docs)
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[kfprobe] $tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    time("synth only")(m)
    time("meta parse")(graft.multimodal.Multimodal.withVideoMeta(m, "payload"))
    time("sync parse")(m.select(col("doc_id"),
      graft.expr.BinaryExpressions.videoSyncSamples(col("payload")).as("k")))
    time("sample nosnap")(graft.multimodal.Multimodal.sampleFrameRanges(m, "payload", 8))
    time("sample snap")(graft.multimodal.Multimodal.sampleFrameRanges(m, "payload", 8,
      snapToKeyframes = true))
    time("snap+explode+order")(graft.multimodal.Multimodal
      .sampleFrameRanges(m, "payload", 8, snapToKeyframes = true)
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.pts_us").as("pts_us"), col("f.byte_offset").as("byte_offset"),
        col("f.byte_len").as("byte_len"))
      .orderBy(col("doc_id"), col("frame_idx")))
    time("snap+explode NO order")(graft.multimodal.Multimodal
      .sampleFrameRanges(m, "payload", 8, snapToKeyframes = true)
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.pts_us").as("pts_us"), col("f.byte_offset").as("byte_offset"),
        col("f.byte_len").as("byte_len")))
    time("barrier+explode")({
      val fr = graft.multimodal.Multimodal
        .sampleFrameRanges(m, "payload", 8, snapToKeyframes = true)
        .select(col("doc_id"), col("frames")).localCheckpoint()
      fr.select(col("doc_id"), explode(col("frames")).as("f"))
        .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
          col("f.pts_us").as("pts_us"), col("f.byte_offset").as("byte_offset"),
          col("f.byte_len").as("byte_len"))
    })
    time("decomposed explode")({
      import org.apache.spark.sql.graftx.Bridge
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        Bridge.column(IntegralDivide(
          Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))
      val mm = graft.multimodal.Multimodal.withVideoMeta(
        m.where(graft.expr.BinaryExpressions.videoSampleable(col("payload"))), "payload")
        .withColumn("__vk", graft.expr.BinaryExpressions.videoSyncSamples(col("payload")))
      val v = col("video")
      val idxArr = array_distinct(transform(sequence(lit(0L), lit(7L)), j => {
        val uni = idiv(j * v.getField("n_frames"), lit(8L))
        when(col("__vk").isNull, uni).otherwise(
          coalesce(array_max(filter(col("__vk"), ky => ky <= uni)), uni))
      }))
      mm.withColumn("__idxs", idxArr)
        .select(col("doc_id"), v.getField("frame_delta").as("__fd"),
          v.getField("timescale").as("__ts"), v.getField("chunk_offset").as("__co"),
          v.getField("sample_size").as("__ss"), explode(col("__idxs")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          idiv(col("frame_idx") * col("__fd").cast("long") * lit(1000000L),
            col("__ts")).as("pts_us"),
          (col("__co") + col("frame_idx") * col("__ss").cast("long")).as("byte_offset"),
          col("__ss").cast("long").as("byte_len"))
    })
    time("stored-payload snap+explode")({
      m.write.mode("overwrite").parquet("/tmp/kfp_payloads")
      val st = spark.read.parquet("/tmp/kfp_payloads")
      graft.multimodal.Multimodal
        .sampleFrameRanges(st, "payload", 8, snapToKeyframes = true)
        .select(col("doc_id"), explode(col("frames")).as("f"))
        .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
          col("f.pts_us").as("pts_us"), col("f.byte_offset").as("byte_offset"),
          col("f.byte_len").as("byte_len"))
    })
    time("snap+order NO explode")(graft.multimodal.Multimodal
      .sampleFrameRanges(m, "payload", 8, snapToKeyframes = true)
      .select(col("doc_id"), col("frames"))
      .orderBy(col("doc_id")))
    val pq = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val mp = graft.queries.PipelineQueries.kfProbeSynth(pq)
    time("parquet snap+explode+order")(graft.multimodal.Multimodal
      .sampleFrameRanges(mp, "payload", 8, snapToKeyframes = true)
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.pts_us").as("pts_us"), col("f.byte_offset").as("byte_offset"),
        col("f.byte_len").as("byte_len"))
      .orderBy(col("doc_id"), col("frame_idx")))
    spark.stop()
  }
}
