package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling / dataset splitting for training-data pipelines
  * (beyond the reference, which has no sampling surface).
  *
  * Everything keys off the polynomial fingerprint of a stable id — NOT an
  * RNG: the assignment is reproducible across runs, engines and cluster
  * layouts (an SQL oracle can replay it), survives re-partitioning, and
  * new rows never reshuffle old rows between splits (the property that
  * matters when a 100 TB corpus grows incrementally: yesterday's train
  * rows stay train rows). All ops are narrow one-pass projections/filters
  * — no shuffle, no driver involvement, filters push down around them.
  */
object Sampling {

  /** Split bucket in [0, 100) for a stable id: fingerprint(id) mod 100. */
  def splitBucket(id: Column): Column =
    TextOps.fingerprint(id.cast(StringType)) % 100

  /** "train"/"test" tag: train iff bucket < trainPct. */
  def splitTag(id: Column, trainPct: Int): Column = {
    require(trainPct >= 0 && trainPct <= 100)
    when(splitBucket(id) < trainPct, "train").otherwise("test")
  }

  /** (train, test) pair split by stable id hash. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): (DataFrame, DataFrame) = {
    val b = splitBucket(col(idCol))
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Deterministic ~pct% sample by stable id hash (a filter, not Spark's
    * RNG `sample`: reproducible and join-consistent — sampling two tables
    * on the same key keeps exactly the matching rows on both sides). */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(splitBucket(col(idCol)) < pct)

  /** Token-budget batch packing — group rows (chunks/documents) into
    * training batches of ~`budget` tokens. Rows are first spread over
    * `streams` independent packing streams by stable id hash (parallelism
    * knob: each stream is one window partition, so streams ≈ a few × the
    * cluster's cores keeps every executor packing), then packed in id
    * order within the stream: a row starting before a budget boundary
    * joins that batch, so batch token sums can overshoot `budget` by less
    * than one row (run packing AFTER chunking, which bounds row length to
    * the context size). Deterministic: same ids + same budget ⇒ same
    * batches, regardless of partitioning — and an SQL oracle can replay
    * it with one window cumsum.
    *
    * Output: input columns + `stream`, `batch` (0-based within stream).
    * One shuffle (hash by stream) + one sorted window pass. */
  def packBudget(df: DataFrame, tokenCol: String, idCol: String,
      budget: Long, streams: Int): DataFrame = {
    require(budget > 0 && streams > 0)
    import org.apache.spark.sql.expressions.Window
    val stream = pmod(TextOps.fingerprint(col(idCol).cast(StringType)), lit(streams))
    val w = Window.partitionBy(col("stream")).orderBy(col(idCol))
    df.withColumn("stream", stream)
      .withColumn("batch",
        floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / budget))
  }

  /** Per-label deterministic sample rates — the class-rebalancing /
    * source-mixing primitive (downsample an over-represented source,
    * keep rare ones whole). Labels not in `pctByLabel` keep `defaultPct`.
    * Still one narrow filter: the label→pct map is a literal. */
  def stratifiedHashSample(df: DataFrame, idCol: String, labelCol: String,
      pctByLabel: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((pctByLabel.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
    val pct =
      if (pctByLabel.isEmpty) lit(defaultPct)
      else coalesce(element_at(typedLit(pctByLabel), col(labelCol)), lit(defaultPct))
    df.filter(splitBucket(col(idCol)) < pct)
  }
}
