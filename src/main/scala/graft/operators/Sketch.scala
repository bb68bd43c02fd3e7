package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Probabilistic membership sketches — the 100 TB prefilter shape: a
  * kilobytes-to-megabytes bloom filter stands in for a massive key set so
  * the expensive exact operator (an anti-join against the full corpus)
  * only runs on the rows the sketch could not rule out. Built on Spark's
  * own partial-aggregating `BloomFilterAggregate` and codegen'd
  * `BloomFilterMightContain` (the machinery behind AQE runtime filters) —
  * not a UDF, so the probe stays inside whole-stage codegen.
  *
  * Scale envelope: the sketch is collected to the driver and re-shipped
  * as a literal (exactly how Spark's InjectRuntimeFilter ships its
  * subquery result). ~1e8 keys at 1 % fpp is ~120 MB — fine; billions of
  * keys would need GBs, at which point the plain anti-join (with AQE's
  * own runtime filter) is the right tool. Guarded accordingly. */
object Sketch {

  /** Max serialized sketch bytes we will collect/ship (256 MB). */
  val MaxSketchBytes: Long = 256L * 1024 * 1024

  /** Serialized bloom filter over `key` (any orderable type — hashed to
    * long via xxhash64 first, the same keying the probe side uses).
    * Returns None when `df` is empty. */
  def bloomBytes(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    require(numBits / 8 <= MaxSketchBytes,
      s"bloom of $expectedItems items at fpp=$fpp needs ${numBits / 8} bytes " +
        s"(> $MaxSketchBytes); use the exact anti-join path at this scale")
    // BloomFilterAggregate silently clamps to the runtime-filter planner
    // confs (defaults: 4M items / 64M bits) — a 1e8-item request would
    // build an 8 MB filter whose real fp rate is ~50%, not fpp. Lift the
    // clamp to the explicitly requested size (already bounded by
    // MaxSketchBytes above).
    // The lift is scoped, not session-wide: the aggregate reads the confs
    // when the job is submitted, and `.head()` is eager, so snapshotting
    // before and restoring in `finally` leaves the session's runtime-filter
    // planner limits untouched for unrelated queries. (Session confs are
    // per-session mutable state — concurrent threads sharing ONE session
    // and racing this block could still observe the lifted value; use
    // separate sessions (`spark.newSession()`) for concurrent pipelines.)
    val spark = df.sparkSession
    val confKeys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
    val saved = confKeys.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confKeys.foreach { case (k, needed) =>
        if (spark.conf.get(k).toLong < needed) spark.conf.set(k, needed.toString)
      }
      val agg = new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.expression(key))),
        Literal(expectedItems), Literal(numBits))
      val row = df.select(Bridge.column(agg.toAggregateExpression())).head()
      Option(row.getAs[Array[Byte]](0))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** Codegen'd membership probe against a driver-held sketch. False
    * positives possible (rate ≈ fpp), false negatives never — so a
    * negative probe is a PROOF of absence. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))

  /** Exact heavy hitters (items with frequency > n/k) in TWO passes with
    * O(k) shuffle state — never a vocabulary-sized count table:
    *
    *  1. a [[graft.functions.MisraGriesSketch]] aggregate finds candidate
    *     items (≤ k−1 of them; every TRUE heavy hitter is guaranteed
    *     present regardless of partitioning/merge order) alongside the
    *     total count, in one narrow scan;
    *  2. the corpus is re-scanned counting ONLY candidate rows (the
    *     broadcast candidate join prunes everything else map-side), and
    *     the exact `cnt > n/k` gate drops the sketch's sub-threshold
    *     extras.
    *
    * Output (item, cnt), exactly the true heavy hitters with exact
    * counts — deterministic, so an external engine replays it as plain
    * GROUP BY/HAVING. At 100 TB both passes are scan-bound; the first
    * shuffles ≤(k−1)-entry maps per partition, the second only the
    * heavy items' rows (map-side combined). */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.MisraGries
    val sk = df.select(item.as("__it")).filter(col("__it").isNotNull)
      .agg(MisraGries.candidatesCol(col("__it"), k).as("__cand"),
        count(lit(1)).cast("double").as("__n"))
    val cands = broadcast(sk.select(explode(col("__cand")).as("item"), col("__n")))
    df.select(item.as("item")).join(cands, "item")
      .groupBy(col("item"), col("__n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("__n") / k)
      .select(col("item"), col("cnt"))
  }
}
