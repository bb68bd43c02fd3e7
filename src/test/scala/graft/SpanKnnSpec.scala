package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** trimDupSpans (Lee et al. ExactSubstr removal) and kNN label voting:
  * hand-computed fixtures pin coverage/union and tie rules. */
class SpanKnnSpec extends SparkSpec {
  import spark.implicits._

  test("trimDupSpans: cross-doc duplicated window removes covered tokens on both sides") {
    val docs = Seq((1L, "a b c d e f"), (2L, "x y a b c z")).toDF("doc_id", "text")
    val out = Dedup.trimDupSpans(docs, "text", "doc_id", n = 3)
      .select("doc_id", "text_trimmed", "n_trimmed_tokens")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("d e f", 3L)) // "a b c" at start 0 covers 0..2
    assert(out(2L) == ("x y z", 3L)) // start 2 covers 2..4
  }

  test("trimDupSpans: within-doc repeats count; overlapping spans union (full wipe)") {
    val docs = Seq((1L, "m n o p m n o p"), (2L, "unrelated words here only")).toDF("doc_id", "text")
    val out = Dedup.trimDupSpans(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_trimmed"), r.getAs[Long]("n_trimmed_tokens"))).toMap
    assert(out(1L) == ("", 8L)) // dup starts 0,1,4,5 cover every position
    assert(out(2L) == ("unrelated words here only", 0L))
  }

  test("trimDupSpans: docs shorter than n pass through with zero trimmed") {
    val docs = Seq((1L, "q r")).toDF("doc_id", "text")
    val r = Dedup.trimDupSpans(docs, "text", "doc_id", n = 3).collect()(0)
    assert(r.getAs[String]("text_trimmed") == "q r")
    assert(r.getAs[Long]("n_trimmed_tokens") == 0L)
  }

  test("leakageSafeSplitTag: no edge straddles splits; pairless rows match splitTag") {
    import graft.operators.Sampling
    val docs = (0L until 100L).map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    // chain 0-1-2 and pair 10-11; everything else unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplitTag(docs, pairs, "id_a", "id_b", "doc_id", 80)
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // components split atomically via their canonical id
    assert(Set(out(0L), out(1L), out(2L)).size == 1 && out(0L)._1 == 0L)
    assert(out(10L) == out(11L) && out(10L)._1 == 10L)
    // unpaired rows: identical to the plain splitTag rule
    val plain = docs.select(col("doc_id"),
      Sampling.splitTag(col("doc_id"), 80).as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 3L until 10L) assert(out(i) == (i, plain(i)))
  }

  test("knnPredict: unanimous vote and majority count") {
    val corpus = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.99f, 0.1f), 0), (3L, Array(0.98f, 0.2f), 0),
      (4L, Array(0f, 1f), 1), (5L, Array(0.1f, 0.99f), 1), (6L, Array(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1f, 0.05f), 9)).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnPredict(corpus, q, "vec_id", "embedding", "label", 3).collect()(0)
    assert(r.getAs[Int]("label") == 0 && r.getAs[Long]("votes") == 3L)
  }

  test("knnPredict: vote tie breaks to the smaller label") {
    val corpus = Seq((1L, Array(1f, 0f), 5), (2L, Array(0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(0.707f, 0.707f), 9)).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnPredict(corpus, q, "vec_id", "embedding", "label", 2).collect()(0)
    assert(r.getAs[Int]("label") == 2 && r.getAs[Long]("votes") == 1L)
  }
}
