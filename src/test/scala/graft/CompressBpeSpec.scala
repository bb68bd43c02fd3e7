package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Compression-ratio signal and distributed BPE application. */
class CompressBpeSpec extends SparkSpec {
  import spark.implicits._

  test("compressionRatio: repetitive text compresses below varied text; edges null") {
    val docs = Seq(
      (1L, Array.fill(200)("spam").mkString(" ")),        // degenerate
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}").mkString(" ")), // varied
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.withCompressionRatio(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L).get < 0.1, s"repetitive ratio ${out(1L)}")
    assert(out(2L).get > out(1L).get * 3, s"varied ${out(2L)} vs ${out(1L)}")
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("compressionRatio is partitioning-invariant (per-partition Deflater state resets)") {
    val docs = (0L until 40L).map(i => (i, s"doc $i " + ("x " * (i % 7).toInt).trim))
      .toDF("doc_id", "text")
    def vals(parts: Int) = TextOps.withCompressionRatio(docs.repartition(parts), "text")
      .collect().map(r => r.getLong(0) -> r.get(2)).toMap
    assert(vals(1) == vals(8))
  }

  test("withBpeTokens equals the driver-side applyBpe word by word") {
    val corpus = Seq((1L, "low lower lowest low low"), (2L, "new newer newest new"))
      .toDF("doc_id", "text")
    val merges = TextOps.trainBpe(corpus, "text", numMerges = 10)
    assert(merges.nonEmpty)
    val got = TextOps.withBpeTokens(corpus, "text", merges)
      .select("doc_id", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = Map(1L -> "low lower lowest low low", 2L -> "new newer newest new")
    for ((id, text) <- texts) {
      val want = text.split(' ').toSeq.flatMap(w => TextOps.applyBpe(w, merges))
      assert(got(id) == want, s"doc $id")
    }
    // round trip: concatenating a word's pieces recovers the word
    assert(TextOps.applyBpe("lowest", merges).mkString == "lowest")
  }

  test("trainBpeDistributed: identical merges to the driver loop, no word cap") {
    // mixed repeat structure so merge priorities shift between rounds and
    // chained merges (l+o, lo+w, ...) must fire in the same order
    val corpus = Seq(
      (1L, "low lower lowest low low newest"),
      (2L, "new newer newest new lowest slow slower"),
      (3L, "window window widow win slow lowest newer"))
      .toDF("doc_id", "text")
    val driver = TextOps.trainBpe(corpus, "text", numMerges = 25)
    val dist = TextOps.trainBpeDistributed(corpus, "text", numMerges = 25)
    assert(dist == driver, s"\ndistributed: $dist\ndriver:      $driver")
    // minWordCount threads through identically too
    assert(TextOps.trainBpeDistributed(corpus, "text", 10, minWordCount = 2L) ==
      TextOps.trainBpe(corpus, "text", 10, minWordCount = 2L))
    // early exhaustion: single-char vocab runs out of pairs before numMerges
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(TextOps.trainBpeDistributed(tiny, "text", 5) ==
      TextOps.trainBpe(tiny, "text", 5))
  }

  test("q_bpe_train: query output equals the driver-loop trainer on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_bpe_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val want = TextOps.trainBpe(docs, "text", numMerges = got.length,
        minWordCount = 2L)
      .zipWithIndex.map { case ((a, b), i) => ((i + 1).toLong, a, b) }
    assert(got.toSeq == want, s"\ngot:  ${got.toSeq}\nwant: $want")
    assert(got.length == 6) // corpus must not exhaust before the K rounds
  }

  test("dsirLogWeights: hand-computed log-likelihood ratios") {
    val raw = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val target = Seq(Tuple1("a a a c")).toDF("text")
    // union vocab {a, b, c}: raw counts (2,2,1) N=5; target (3,0,1) N=4; V=3
    def lr(ct: Double, cr: Double) =
      math.log((ct + 0.5) / (4 + 0.5 * 3)) - math.log((cr + 0.5) / (5 + 0.5 * 3))
    val want = Map(
      1L -> (2 * lr(3, 2) + lr(0, 2)), // a a b
      2L -> (lr(0, 2) + lr(1, 1)))     // b c
    val got = graft.operators.TextOps.dsirLogWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, w) <- want) assert(math.abs(got(id) - w) < 1e-12, s"doc $id")
    // the target-like doc scores higher
    assert(got(1L) > got(2L) == (want(1L) > want(2L)))
  }

  test("withBpeTokens: null text stays null") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextOps.withBpeTokens(df, "text", Seq("l" -> "o")).collect()(0).isNullAt(2))
  }
}
