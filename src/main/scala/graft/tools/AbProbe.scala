package graft.tools

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: interleaved A/B timing of old-vs-new operator formulations in
  * ONE JVM (the r12 noise discipline — absolute numbers from two separate
  * sessions are meaningless under fleet co-tenant drift; alternating the
  * two forms inside one session cancels the window). Also asserts the two
  * forms are result-identical (bit_xor row hash). */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def hashOf(df: DataFrame): Long = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    }
    def ab(tag: String, reps: Int = 4)(a: => DataFrame)(b: => DataFrame): Unit = {
      val ha = hashOf(a); val hb = hashOf(b); sweep()
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime(); noop(a); as += (System.nanoTime() - t0) / 1e9
        sweep()
        val t1 = System.nanoTime(); noop(b); bs += (System.nanoTime() - t1) / 1e9
        sweep()
      }
      def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
      println(f"[ab] $tag%-38s A=${med(as.toSeq)}%6.2f s  B=${med(bs.toSeq)}%6.2f s  " +
        f"(B/A=${med(bs.toSeq) / med(as.toSeq)}%4.2f)  hashes ${if (ha == hb) "MATCH" else s"DIFFER $ha $hb"}" +
        as.map(v => f"$v%.2f").mkString("  A[", " ", "]") +
        bs.map(v => f"$v%.2f").mkString(" B[", " ", "]"))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    // ---- 1. langIdCt: lazy profiles (3 corpus scans) vs collected ----
    if (args.isEmpty || args.contains("langid")) {
      def oldLangId(): DataFrame = {
        val profiles = TextOps.trainLangProfiles(docs, "text", "lang")
        val k = 300L
        val docGrams = docs
          .select(col("doc_id"), explode_outer(
            when(length(col("text")) < 3, array().cast(ArrayType(StringType)))
              .otherwise(transform(sequence(lit(1), length(col("text")) - 2),
                i => col("text").substr(i, lit(3))))).as("gram"))
          .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("__cnt"))
          .withColumn("__rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("__cnt").desc, col("gram"))))
          .filter(col("__rank") <= 50)
        val langs = profiles.select(col("lang")).distinct()
        val scored = docGrams
          .crossJoin(broadcast(langs))
          .join(broadcast(profiles.withColumnRenamed("rank", "__prank")),
            Seq("lang", "gram"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(coalesce(abs(col("__rank") - col("__prank")), lit(k)))
            .as("__dist"))
        scored.withColumn("__r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("__dist").asc, col("lang"))))
          .filter(col("__r") === 1)
          .select(col("doc_id"), col("lang").as("lang_pred"),
            col("__dist").as("ct_dist"))
          .orderBy(col("doc_id"))
      }
      def newLangId(): DataFrame = {
        val profiles = TextOps.trainLangProfiles(docs, "text", "lang")
        TextOps.langIdCt(docs, "text", "doc_id", profiles)
          .orderBy(col("doc_id"))
      }
      ab("langid: lazy(A) vs collected(B)")(oldLangId())(newLangId())
    }

    // ---- 2. minhash signatures: explode+agg vs native kernel ----
    if (args.isEmpty || args.contains("minhash")) {
      val oldFam = Dedup.MinhashFamily.polynomial.copy(sigArray = None)
      ab("minhashSignatures: agg(A) vs native(B)")(
        Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3, oldFam))(
        Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3,
          Dedup.MinhashFamily.polynomial))
      ab("minhashNearDups: agg(A) vs native(B)")(
        Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5,
          family = oldFam))(
        Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5,
          family = Dedup.MinhashFamily.polynomial))
    }

    // ---- 3. banded signature projection: 16 HOF passes vs native ----
    if (args.isEmpty || args.contains("banded")) {
      val k = 16; val bands = 4; val r = k / bands
      val sh = array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))
      def oldBanded(): DataFrame = {
        val parts = transform(col("__sh"), x => {
          val p = TextOps.fingerprintParts(x).toMap
          struct(p("fp").as("fp"), p("pw").as("pw"))
        })
        val sigCols = (0 until k).map { j =>
          array_min(transform(col("__parts"), p =>
            TextOps.prefixedFingerprintFromParts(s"$j:",
              p.getField("fp"), p.getField("pw")))).as(s"m$j")
        }
        val bandCols = (0 until bands).map { b =>
          val elems = (b * r until (b + 1) * r).map(j => col(s"m$j"))
          struct(lit(b).as("band"), concat_ws(",", elems: _*).as("bucket"))
        }
        docs.select(col("doc_id").cast("long").as("doc_id"), sh.as("__sh"))
          .filter(size(col("__sh")) >= 1)
          .withColumn("__parts", parts)
          .select(col("doc_id") +: sigCols: _*)
          .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"),
            array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.bucket").as("bucket"), col("sig"))
      }
      def newBanded(): DataFrame = {
        val bandCols = (0 until bands).map { b =>
          val elems = (b * r until (b + 1) * r)
            .map(j => element_at(col("__sig"), j + 1))
          struct(lit(b).as("band"), concat_ws(",", elems: _*).as("bucket"))
        }
        docs.select(col("doc_id").cast("long").as("doc_id"), sh.as("__sh"))
          .filter(size(col("__sh")) >= 1)
          .select(col("doc_id"),
            graft.expr.TextExpressions.minhashSigs(col("__sh"), k).as("__sig"))
          .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"),
            col("__sig").as("sig"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.bucket").as("bucket"), col("sig"))
      }
      ab("bandedSignatures: HOF(A) vs native(B)")(oldBanded())(newBanded())
    }

    // ---- 3b. per-doc quality signals: HOF forms vs one-pass native ----
    if (args.isEmpty || args.contains("textstats")) {
      def statsOf(q: Column, lang: Column, nbpe: Column, uniq: Column,
          stop: Column): DataFrame =
        docs.select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          nbpe.as("n_bpe"),
          round(uniq, 6).as("uniq_ratio"),
          round(stop, 6).as("stop_ratio"),
          round(q, 6).as("quality"),
          lang.as("lang_pred"),
          TextOps.fingerprint(col("text")).as("fingerprint"))
      ab("textstats: HOF(A) vs native(B)")(
        statsOf(TextOps.qualityScoreHof(col("text")), TextOps.langIdHof(col("text")),
          TextOps.tokenCountBpeIshHof(col("text")),
          TextOps.uniqueTokenRatioHof(col("text")), TextOps.stopwordRatioHof(col("text"))))(
        statsOf(TextOps.qualityScore(col("text")), TextOps.langId(col("text")),
          TextOps.tokenCountBpeIsh(col("text")),
          TextOps.uniqueTokenRatio(col("text")), TextOps.stopwordRatio(col("text"))))
      def qfilter(q: Column, lang: Column): DataFrame = {
        val scored = docs.select(col("doc_id"), col("text"),
            round(q, 6).as("q"), lang.as("lang_pred"),
            TextOps.tokenCount(col("text")).as("nt"))
          .filter(col("q") >= 0.55 && col("lang_pred") === "en" && col("nt") >= 20)
        Dedup.dropExactDups(scored, "text", "doc_id")
          .select(col("doc_id"), col("q"), col("nt"))
      }
      ab("qualityfilter: HOF(A) vs native(B)")(
        qfilter(TextOps.qualityScoreHof(col("text")), TextOps.langIdHof(col("text"))))(
        qfilter(TextOps.qualityScore(col("text")), TextOps.langId(col("text"))))
    }

    // ---- 4. q_curate2 stage sharing: persist vs repartition reuse ----
    if (args.isEmpty || args.contains("curate2")) {
      def stage(): DataFrame = {
        val gated = TextOps.gopherQualityFlags(docs, "text")
          .filter(col("gopher_pass")).select(col("doc_id"), col("text"))
        Dedup.trimDupSpans(gated, "text", "doc_id", n = 15)
          .select(col("doc_id"), col("text_trimmed").as("clean"),
            col("n_trimmed_tokens"))
      }
      def finish(trimmed: DataFrame): DataFrame = {
        val canon = Dedup.dropExactDups(trimmed, "clean", "doc_id")
        canon
          .withColumn("split", graft.operators.Sampling.splitTag(col("doc_id"), 80))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_trimmed_tokens")).as("trimmed_sum"),
            sum(TextOps.tokenCount(col("clean"))).as("tokens_sum"))
          .orderBy(col("split"))
      }
      ab("curate2: persist(A) vs repartition(B)")(
        finish(stage().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))(
        finish(stage().repartition(col("doc_id"))))
      ab("curate2: lazy-noop(A) vs eager-collect(B)")(
        finish(stage().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))({
        val trimmed = stage().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = finish(trimmed)
        val rows = out.collect()
        trimmed.unpersist(blocking = true)
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      })
    }
    spark.stop()
  }
}
