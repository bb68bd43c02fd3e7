package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** BM25 / RRF retrieval semantics, hand-computed on a 4-doc corpus. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark join spark"),          // dl 3, tf(spark)=2, tf(join)=1
    (1L, "join the window now"),       // dl 4
    (2L, "nothing relevant here"),     // dl 3, no hits
    (3L, "spark")                      // dl 1
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi scores") {
    val got = Search.bm25(corpus, "text", "doc_id", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // N=4, avgdl=11/4=2.75; df(spark)=2, df(join)=2
    // idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    val idf = math.log(2.0)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))
    val exp0 = s(2, 3) + s(1, 3)
    val exp1 = s(1, 4)
    val exp3 = s(1, 1)
    assert(got.keySet === Set(0L, 1L, 3L)) // doc 2 has no query terms
    assert(math.abs(got(0L) - exp0) < 1e-12)
    assert(math.abs(got(1L) - exp1) < 1e-12)
    assert(math.abs(got(3L) - exp3) < 1e-12)
  }

  test("bm25TopK ranks by rounded score with id tiebreak, no global window") {
    val top = Search.bm25TopK(corpus, "text", "doc_id", Seq("spark", "join"), 2)
    val rows = top.orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 3L)) // doc 0 highest, then 3
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    val globalWins = top.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWins.isEmpty, "bm25TopK must not plan a partition-less window")
  }

  test("rrfFuse sums reciprocal ranks across lists") {
    val a = Seq((10L, 1L), (11L, 2L)).toDF("id", "rank")
    val b = Seq((11L, 1L), (12L, 2L)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(a, b), "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList.sortBy(_._1)
    assert(got.map(_._1) === List(10L, 11L, 12L))
    assert(math.abs(got(1)._2 - (1.0 / 61 + 1.0 / 62)) < 1e-15) // doc in both lists
    assert(got(1)._3 === 2L)
    assert(math.abs(got(0)._2 - 1.0 / 61) < 1e-15)
  }

  test("hybridTopK fuses lexical and semantic rankings over the same ids") {
    val docs = Seq(
      (0L, "query terms here"), (1L, "spark join window"),
      (2L, "spark spark join"), (3L, "unrelated text")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val fused = Search.hybridTopK(docs, "text", "doc_id", Seq("spark", "join"),
      emb, "vec_id", "embedding", queryVecId = 0L, k = 3)
    val byId = fused.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // docs 1 and 2 hit both lists (lexical + within cosine top-3); doc 3
    // only the cosine list; doc 0 is the query vector (excluded) and has
    // no query terms
    assert(byId(1L) === 2L && byId(2L) === 2L)
    assert(byId(3L) === 1L)
    assert(!byId.contains(0L))
  }

  test("bm25FromIndex over the materialized index == bm25 over the corpus") {
    val idx = Search.bm25Index(corpus, "text", "doc_id")
    // the index is exactly the per-(doc,term) tf + dl table
    val postings = idx.collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(1), r.getLong(3))).toMap
    assert(postings((0L, "spark")) === ((3L, 2L)))
    assert(postings((0L, "join")) === ((3L, 1L)))
    assert(postings((1L, "the")) === ((4L, 1L)))
    assert(postings.size === 10) // 10 distinct (doc, term) pairs
    val direct = Search.bm25(corpus, "text", "doc_id", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = Search.bm25FromIndex(idx, "doc_id", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served.keySet === direct.keySet)
    served.foreach { case (id, s) => assert(math.abs(s - direct(id)) < 1e-12) }
  }

  test("bm25IndexMaintain: maintained == recomputed under seeded churn") {
    val docs = spark.range(200).select($"id".as("doc_id"),
      concat_ws(" ", lit("term"), ($"id" % 7).cast("string"),
        lit("word"), ($"id" % 13).cast("string"),
        lit("tok"), ($"id" % 3).cast("string")).as("text"))
    // churn: drop %17, rewrite %11 (changed text changes postings),
    // re-add %19 under new ids; one rewrite collapses to a 1-token text
    val newRel = docs.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", when($"doc_id" % 11 === 0,
          when($"doc_id" === 33, lit("solo")) // degenerate rewrite
            .otherwise(concat($"text", lit(" extra extra"))))
        .otherwise($"text").as("text"))
      .unionByName(docs.filter($"doc_id" % 19 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
    val changes = graft.operators.Diff.snapshotDiff(
        docs, newRel, Seq("doc_id"), Seq("text"))
      .filter($"change" =!= "unchanged")
    val maintained = Search.bm25IndexMaintain(
      Search.bm25Index(docs, "text", "doc_id"), changes, "text", "doc_id")
    val recomputed = Search.bm25Index(newRel, "text", "doc_id")
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty)
    // the degenerate rewrite's postings really did shrink to one row
    assert(maintained.filter($"doc_id" === 33).count() === 1)
    // and serving from the maintained index == direct BM25 on the release
    val direct = Search.bm25(newRel, "text", "doc_id", Seq("term", "extra"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = Search.bm25FromIndex(maintained, "doc_id", Seq("term", "extra"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served.keySet === direct.keySet)
    served.foreach { case (id, s) => assert(math.abs(s - direct(id)) < 1e-9) }
  }
}
