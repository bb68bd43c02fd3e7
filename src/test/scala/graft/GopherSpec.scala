package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Gopher-style repetition and quality signals (Rae et al. 2021 Table A1):
  * hand-computed fixtures pin the exact fraction rules and tie-breaks the
  * oracle replays. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def rep(text: String, topNs: Seq[Int], dupNs: Seq[Int]) =
    TextOps.repetitionSignals(Seq(text).toDF("text"), "text", topNs, dupNs)
      .collect()(0)

  test("repetitionSignals: duplicate-line fractions (hand-computed)") {
    // lines: ["a b a b c", "a b a b c", "x"] -> 3 lines, 2 distinct
    val r = rep("a b a b c\na b a b c\nx", Seq(), Seq())
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12)
    // line chars 9+9+1=19; dup occurrence chars = 9 (second "a b a b c")
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 9.0 / 19) < 1e-12)
  }

  test("repetitionSignals: top/dup n-gram char fractions (hand-computed)") {
    // "a b a b c": 2-grams [a b, b a, a b, b c]; top = ("a b", 2); len(T)=9
    val r = rep("a b a b c", Seq(2), Seq(2))
    assert(math.abs(r.getAs[Double]("top_2gram_char_frac") - 6.0 / 9) < 1e-12)
    // dup chars: second "a b" = 3 chars
    assert(math.abs(r.getAs[Double]("dup_2gram_char_frac") - 3.0 / 9) < 1e-12)
    // single line, no duplicate lines
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
  }

  test("repetitionSignals: top-gram count tie breaks lexicographically smallest") {
    // "a b c a b c": 2-grams [a b, b c, c a, a b, b c] -> "a b" and "b c"
    // both occur twice; tie must resolve to "a b". len(T)=11
    val r = rep("a b c a b c", Seq(2), Seq())
    assert(math.abs(r.getAs[Double]("top_2gram_char_frac") - 6.0 / 11) < 1e-12)
  }

  test("repetitionSignals: empty text and short docs are all-zero, not null/error") {
    for (t <- Seq("", "a", "a b")) {
      val r = rep(t, Seq(3), Seq(5))
      assert(r.getAs[Double]("dup_line_frac") == 0.0)
      assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
      assert(r.getAs[Double]("top_3gram_char_frac") == 0.0)
      assert(r.getAs[Double]("dup_5gram_char_frac") == 0.0)
    }
  }

  test("gopherQualityFlags: hand-computed sub-signals") {
    val r = TextOps.gopherQualityFlags(
      Seq("the cat to of and runs").toDF("text"), "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 6L)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 17.0 / 6) < 1e-12)
    assert(r.getAs[Double]("frac_alpha_words") == 1.0)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r.getAs[Long]("stopword_hits") == 4L) // the, to, of, and
    assert(!r.getAs[Boolean]("gopher_pass")) // 6 words < 50
  }

  test("gopherQualityFlags: bullet / ellipsis / symbol line rules") {
    val r = TextOps.gopherQualityFlags(
      Seq("- a\n* b\nc d...\ne…\n# f #").toDF("text"), "text").collect()(0)
    assert(math.abs(r.getAs[Double]("frac_bullet_lines") - 2.0 / 5) < 1e-12)
    assert(math.abs(r.getAs[Double]("frac_ellipsis_lines") - 2.0 / 5) < 1e-12)
    // symbols: two '#' and one '…' = 3, words: a,b,d...,f + markers
    val words = "- a\n* b\nc d...\ne…\n# f #".split(" ").length
    assert(math.abs(r.getAs[Double]("symbol_word_ratio") - 3.0 / words) < 1e-12)
  }

  test("gopherQualityFlags: a clean 64-word doc passes every published gate") {
    val text = Array.fill(8)("the be to of and that have with").mkString(" ")
    val r = TextOps.gopherQualityFlags(Seq(text).toDF("text"), "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 64L)
    assert(r.getAs[Double]("mean_word_len") == 3.0)
    assert(r.getAs[Boolean]("gopher_pass"))
  }

  test("native GramStats == sorted-array HOF formulation (differential)") {
    val docs = Seq(
      "a b a b c", "a b c a b c", "x", "", "a", "same same same same",
      "one two three four five six seven", "z y x w z y x w z y")
      .toDF("text")
    val arr = split(col("text"), " ")
    val both = docs.select(
      graft.expr.TextExpressions.gramStatsCol(graft.operators.TextOps.shingles(arr, 2)).as("native"),
      graft.operators.TextOps.gramStatsHof(graft.operators.TextOps.shingles(arr, 2)).as("hof"))
      .collect()
    for (r <- both) {
      val (n, h) = (r.getStruct(0), r.getStruct(1))
      for (f <- 0 until 4)
        assert(n.getLong(f) == h.getLong(f), s"field $f: $n vs $h")
    }
  }

  test("GramStats matches a sequential Scala model on seeded random arrays") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "b", "ab", "xyz", "q", "longertoken", "")
    val trials = (0 until 60).map { t =>
      (t.toLong, Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    val got = trials.toDF("t", "arr")
      .select(col("t"), graft.expr.TextExpressions.gramStatsCol(col("arr")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    for ((t, arr) <- trials) {
      val counts = arr.groupBy(identity).view.mapValues(_.size).toMap
      val total = arr.map(_.length).sum.toLong
      val dupChars = counts.collect { case (v, c) if c > 1 => (c - 1).toLong * v.length }.sum
      val dupCount = counts.values.collect { case c if c > 1 => (c - 1).toLong }.sum
      val topChars = if (counts.isEmpty) 0L else {
        val (v, c) = counts.toSeq.sortBy { case (v, c) => (-c, v) }.head
        c.toLong * v.length
      }
      val s = got(t)
      assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
        ((total, dupChars, dupCount, topChars)), s"trial $t arr=$arr")
    }
  }

  test("repetitionSignals plan is shuffle-free (scan -> project only)") {
    val df = TextOps.repetitionSignals(
      spark.range(10).select(concat(lit("w x y z w x "), $"id").as("text")),
      "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
