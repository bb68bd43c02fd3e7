package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes (the trained quality/domain-classifier role):
  * hand-computed fixtures pin the vocab cut, add-one smoothing, the
  * floor-micros log carrier, the zero-vocab-token prior fallback, and the
  * lexicographic argmax tie — the exact rules the q_nb_classify oracle
  * replays. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("spam buy pills buy", "spam"),
    ("buy now cheap pills", "spam"),
    ("meeting notes agenda", "ham"),
    ("agenda for the meeting", "ham"),
    ("the quarterly meeting agenda", "ham")
  ).toDF("text", "label")

  test("trainNaiveBayes: vocab is top-K by count with lexicographic ties") {
    val (loglik, _) = TextOps.trainNaiveBayes(train, "text", "label", vocabK = 3)
    // counts: buy 3, meeting 3, agenda 3, pills 2, the 2, ... top-3 by
    // (count desc, term asc) = agenda, buy, meeting
    val terms = loglik.select("t").distinct().as[String].collect().sorted
    assert(terms.toSeq == Seq("agenda", "buy", "meeting"))
  }

  test("trainNaiveBayes: dense grid carries smoothed zero counts exactly") {
    val (loglik, priors) = TextOps.trainNaiveBayes(train, "text", "label", vocabK = 3)
    val ll = loglik.collect().map(r =>
      (r.getAs[String]("label"), r.getAs[String]("t")) -> r.getAs[Long]("lpm")).toMap
    assert(ll.size == 6) // 2 labels x 3 vocab terms, zero-count pairs included
    // spam vocab-token total = 3 (buy x3); V = 3
    // p(buy|spam) = (3+1)/(3+3); p(agenda|spam) = (0+1)/(3+3)
    assert(ll(("spam", "buy")) == math.floor(math.log(4.0 / 6) * 1e6).toLong)
    assert(ll(("spam", "agenda")) == math.floor(math.log(1.0 / 6) * 1e6).toLong)
    // ham vocab-token total = 6 (meeting x3, agenda x3)
    assert(ll(("ham", "meeting")) == math.floor(math.log(4.0 / 9) * 1e6).toLong)
    assert(ll(("ham", "buy")) == math.floor(math.log(1.0 / 9) * 1e6).toLong)
    val pm = priors.collect().map(r =>
      r.getAs[String]("label") -> r.getAs[Long]("prior_m")).toMap
    assert(pm("spam") == math.floor(math.log(2.0 / 5) * 1e6).toLong)
    assert(pm("ham") == math.floor(math.log(3.0 / 5) * 1e6).toLong)
  }

  test("naiveBayesClassify: separable docs classify; scores are exact integer sums") {
    val (loglik, priors) = TextOps.trainNaiveBayes(train, "text", "label", vocabK = 10)
    val docs = Seq(
      (1L, "buy cheap pills now"),
      (2L, "meeting agenda for the team")
    ).toDF("doc_id", "text")
    val out = TextOps.naiveBayesClassify(docs, "text", "doc_id", loglik, priors)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("nb_pred") == "spam")
    assert(out(1).getAs[String]("nb_pred") == "ham")
    // score reproducibility: recompute doc 2's ham score by hand from the
    // published model (prior + sum over vocab tokens of count * lpm)
    val ll = loglik.collect().map(r =>
      (r.getAs[String]("label"), r.getAs[String]("t")) -> r.getAs[Long]("lpm")).toMap
    val pm = priors.collect().map(r =>
      r.getAs[String]("label") -> r.getAs[Long]("prior_m")).toMap
    val vocabTerms = ll.keys.collect { case (l, t) if l == "ham" => t }.toSet
    val toks = "meeting agenda for the team".split(" ").filter(vocabTerms)
    val expected = pm("ham") + toks.map(t => ll(("ham", t))).sum
    assert(out(1).getAs[Long]("nb_score_micros") == expected)
    assert(out(1).getAs[Long]("n_vocab_toks") == toks.length)
  }

  test("naiveBayesClassify: zero-vocab-token doc falls back to the prior argmax") {
    val (loglik, priors) = TextOps.trainNaiveBayes(train, "text", "label", vocabK = 10)
    val docs = Seq((7L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextOps.naiveBayesClassify(docs, "text", "doc_id", loglik, priors).collect()
    assert(out.length == 1)
    // ham has the larger prior (3/5 vs 2/5)
    assert(out(0).getAs[String]("nb_pred") == "ham")
    assert(out(0).getAs[Long]("n_vocab_toks") == 0L)
    val pm = priors.collect().map(r =>
      r.getAs[String]("label") -> r.getAs[Long]("prior_m")).toMap
    assert(out(0).getAs[Long]("nb_score_micros") == pm("ham"))
  }

  private def counts(tc: org.apache.spark.sql.DataFrame) =
    tc.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
  private def labels(ld: org.apache.spark.sql.DataFrame) =
    ld.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  test("nbCountsMaintain: maintained statistics and model equal a from-scratch retrain") {
    val added = Seq(
      ("pills pills pills discount", "spam"),
      ("team meeting recap", "ham")).toDF("text", "label")
    val removed = Seq(("meeting notes agenda", "ham")).toDF("text", "label")
    val v1 = train.exceptAll(removed).unionByName(added)
    val (tc0, ld0) = TextOps.nbCounts(train, "text", "label")
    val (tcM, ldM) = TextOps.nbCountsMaintain(tc0, ld0, added, removed, "text", "label")
    val (tcR, ldR) = TextOps.nbCounts(v1, "text", "label")
    assert(counts(tcM) == counts(tcR))
    assert(labels(ldM) == labels(ldR))
    // the built models are bit-identical too (vocab cut included — the
    // delta moved 'pills' up and dropped 'notes' from the corpus)
    val (llM, prM) = TextOps.nbModel(tcM, ldM, vocabK = 4)
    val (llR, prR) = TextOps.nbModel(tcR, ldR, vocabK = 4)
    assert(counts(llM) == counts(llR))
    assert(labels(prM) == labels(prR))
  }

  test("nbCountsMaintain: zeroed rows drop; empty deltas are identity") {
    val (tc0, ld0) = TextOps.nbCounts(train, "text", "label")
    val empty = Seq.empty[(String, String)].toDF("text", "label")
    val (tcI, ldI) = TextOps.nbCountsMaintain(tc0, ld0, empty, empty, "text", "label")
    assert(counts(tcI) == counts(tc0))
    assert(labels(ldI) == labels(ld0))
    // removing the only spam docs zeroes every spam row and the label
    val allSpam = train.filter($"label" === "spam")
    val (tcZ, ldZ) = TextOps.nbCountsMaintain(tc0, ld0, empty, allSpam, "text", "label")
    assert(!counts(tcZ).exists(_._1 == "spam"))
    assert(labels(ldZ) == Seq(("ham", 3L)))
  }

  test("nbCountsMaintain: an inconsistent delta fails loudly instead of corrupting the state") {
    // removing docs the state NEVER counted drives merged counts
    // negative — silently filtering those rows would diverge the
    // maintained state from a retrain with no error. The check rides
    // inside the count projection (no extra job): materializing the
    // maintained state surfaces a named SparkException.
    val (tc0, ld0) = TextOps.nbCounts(train, "text", "label")
    val empty = Seq.empty[(String, String)].toDF("text", "label")
    val phantom = Seq(
      ("buy buy buy buy buy pills pills pills", "spam"),
      ("buy pills", "spam"),
      ("buy pills now", "spam")).toDF("text", "label")
    val (tcBad, ldBad) =
      TextOps.nbCountsMaintain(tc0, ld0, empty, phantom, "text", "label")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(c => Option(c.getMessage).getOrElse("")).mkString("\n")
    val e = intercept[Exception](tcBad.collect())
    assert(chain(e).contains("nbCountsMaintain"), s"wrong error: ${chain(e)}")
    val e2 = intercept[Exception](ldBad.collect())
    assert(chain(e2).contains("nbCountsMaintain"))
    // a consistent delta (remove docs actually present) stays green
    val ok = train.filter($"label" === "spam").limit(1)
    val (tcOk, ldOk) =
      TextOps.nbCountsMaintain(tc0, ld0, empty, ok, "text", "label")
    assert(tcOk.collect().nonEmpty && ldOk.collect().nonEmpty)
  }

  test("trainNaiveBayes: model is invariant to input partitioning") {
    // the vocab cut is a TakeOrdered over a total order and every count
    // is exact, so the published model must be bit-identical whether the
    // training corpus arrives as 1 partition or 7
    def modelOf(df: org.apache.spark.sql.DataFrame) = {
      val (loglik, priors) = TextOps.trainNaiveBayes(df, "text", "label", vocabK = 4)
      (loglik.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq,
        priors.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
    }
    assert(modelOf(train.repartition(7)) == modelOf(train.coalesce(1)))
  }

  test("naiveBayesClassify: exact score tie resolves to the lexicographically first label") {
    // symmetric corpus: both labels see the same counts, so every score
    // ties exactly (integer micros) and the argmax must pick "a"
    val sym = Seq(("x y", "a"), ("x y", "b")).toDF("text", "label")
    val (loglik, priors) = TextOps.trainNaiveBayes(sym, "text", "label", vocabK = 10)
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    val out = TextOps.naiveBayesClassify(docs, "text", "doc_id", loglik, priors).collect()
    assert(out(0).getAs[String]("nb_pred") == "a")
  }
}
