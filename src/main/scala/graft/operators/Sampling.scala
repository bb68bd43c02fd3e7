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

  /** LEAKAGE-SAFE train/test split: near-duplicate documents must land in
    * the SAME split, or the test set is contaminated by trained-on text
    * (the Lee et al. 2022 finding). Every row splits by the fingerprint
    * bucket of its near-dup COMPONENT's canonical id (min id over the
    * pair graph via [[graft.operators.Dedup.connectedComponents]]); rows
    * in no pair split by their own id — identical rule to [[splitTag]],
    * so adding the pair graph only MOVES near-dup groups atomically, and
    * the whole assignment stays RNG-free and engine-replayable.
    *
    * Shape (100 TB): components run over the pair graph only (edges ≪
    * corpus); the label table joins back broadcast-sized. Appends
    * `split_key` (the component canonical or own id) and `split`. */
  def leakageSafeSplitTag(docs: DataFrame, pairs: DataFrame, aCol: String,
      bCol: String, idCol: String, trainPct: Int): DataFrame = {
    val comp = graft.operators.Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("root"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("root"), col(idCol)))
      .withColumn("split", splitTag(col("split_key"), trainPct))
      .drop("root")
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

  /** Per-label cap — "at most N documents per domain/source": rows are
    * ranked inside each label by (fingerprint(id), id) — a deterministic
    * shuffle-order, not arrival order, so the kept subset is unbiased,
    * reproducible, and stable under corpus growth (a new row only ever
    * displaces the current max-rank row, never reshuffles the rest).
    * One hash shuffle on the label + a per-label window; hot labels are
    * exactly the ones being capped, and the rank-limit pushes the window
    * into WindowGroupLimit (partial top-N before the shuffle). */
  def capPerLabel(df: DataFrame, idCol: String, labelCol: String, maxN: Int): DataFrame = {
    require(maxN > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(labelCol))
      .orderBy(splitBucket100k(col(idCol)), col(idCol))
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxN)
      .drop("__r")
  }

  /** Finer-grained bucket in [0, 100000) for rank ordering (the percent
    * bucket collides too often to act as a shuffle order). */
  private def splitBucket100k(id: Column): Column =
    TextOps.fingerprint(id.cast(StringType)) % 100000

  /** Weighted mixture upsampling — dataset MIXING for training: each
    * label (source/quality tier) carries an epoch weight, possibly
    * fractional and > 1 (e.g. wiki 3.5, common-crawl 0.8). A row with
    * weight w is emitted floor(w) times, plus one more for the
    * deterministic frac(w) of ids (fingerprint bucket < frac·100) —
    * expected multiplicity exactly w per label, zero RNG, reproducible
    * across engines and incremental corpus growth. Emitted copies carry
    * `epoch` (0-based copy index) so downstream shuffles can spread
    * repeats. A narrow explode — no shuffle; weights are a literal map.
    * Weights are quantized to percent (w = 2.375 → 2.38, half-up). */
  def weightedMix(df: DataFrame, idCol: String, labelCol: String,
      weightByLabel: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weightByLabel.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100))
    // round, not truncate: 0.29 is 0.28999… in binary and must mean 29%
    val pctOf = (w: Double) => math.round(w * 100)
    val pct =
      if (weightByLabel.isEmpty) lit(pctOf(defaultWeight))
      else coalesce(
        element_at(typedLit(weightByLabel.map { case (k, v) => k -> pctOf(v) }), col(labelCol)),
        lit(pctOf(defaultWeight)))
    val copies = floor(pct / 100L).cast(LongType) +
      when(splitBucket(col(idCol)) < pct % 100L, 1L).otherwise(0L)
    // Spark's sequence(a, b) runs DESCENDING when b < a, so copies == 0
    // must short-circuit to an empty array (zero emitted rows), not
    // sequence(0, -1)
    val epochs = when(copies > 0, sequence(lit(0L), copies - 1L))
      .otherwise(array().cast(ArrayType(LongType)))
    df.withColumn("epoch", explode(epochs))
  }

  /** TEMPERATURE-scaled mixture resampling (the multilingual /
    * multi-source rebalancing rule, Conneau & Lample 2019): target
    * share of label l is n_l^tau / Σ_m n_m^tau, so tau = 1 keeps the
    * natural mix and tau → 0 flattens toward uniform — rare sources
    * upsample, dominant ones downsample. Per-row multiplicity is
    * share_l · (targetScale · N) / n_l, materialized by the
    * deterministic floor+frac rule of [[weightedMix]] (zero RNG,
    * engine-replayable).
    *
    * The label histogram is ONE partial-merged aggregate collected to
    * the driver — labels are a mixture spec (sources/languages, tens to
    * hundreds), not data-sized; the weights then travel as a literal
    * map inside the narrow explode. Null labels get defaultWeight 0
    * (dropped). `maxWeight` caps any single label's multiplicity (the
    * per-source epoch cap): under extreme skew a rare label's weight
    * grows as (n_max/n_l)^(1−tau) and must saturate, not error. */
  def temperatureMix(df: DataFrame, idCol: String, labelCol: String,
      tau: Double, targetScale: Double = 1.0, maxWeight: Double = 100.0): DataFrame = {
    require(tau > 0 && tau <= 1, s"temperatureMix: tau must be in (0, 1], got $tau")
    require(targetScale > 0, "temperatureMix: targetScale must be > 0")
    require(maxWeight > 0 && maxWeight <= 100,
      s"temperatureMix: maxWeight must be in (0, 100], got $maxWeight")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.get(0)).map(l => l.toString -> r.getLong(1)))
    require(counts.length <= 10000,
      s"temperatureMix: ${counts.length} labels — this is a mixture spec, not a join key")
    val total = counts.map(_._2).sum.toDouble
    val powSum = counts.map { case (_, n) => math.pow(n.toDouble, tau) }.sum
    // extreme skew can push a rare label's weight arbitrarily high
    // (weight ~ (n_max/n_l)^(1-tau)); clamp at maxWeight — the standard
    // per-source epoch cap — instead of tripping weightedMix's bound with
    // a context-free error
    val weights = counts.map { case (l, n) =>
      l -> math.min(maxWeight,
        math.pow(n.toDouble, tau) / powSum * targetScale * total / n)
    }.toMap
    weightedMix(df, idCol, labelCol, weights, defaultWeight = 0.0)
  }

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

  /** Priority sample (Duffield–Lund–Thorup, JACM'07): a weight-aware
    * fixed-size sample that supports UNBIASED subset-sum estimation after
    * the fact — sample k docs once ∝ weight (tokens, chars, bytes), then
    * estimate the total weight of ANY predicate-defined slice from the k
    * rows alone: E[Σ_{sampled ∧ P} est_w] = Σ_P w. The after-the-fact part
    * is what a 100 TB curation loop wants: one standing sample answers
    * slice-size questions that were not known when the sample was drawn.
    *
    * Per row, priority q = w / u with u uniform on (0, 1]; the k largest
    * priorities are the sample, τ = the (k+1)-th largest, and each sampled
    * row carries the DLT estimator est_w = max(w, τ) (groups with ≤ k rows
    * keep everything with est_w = w exactly — τ is null). Priority
    * sampling has near-optimal variance among all k-row subset-sum
    * sketches (Szegedy STOC'06).
    *
    * Deterministic, not pseudo-random: u = toDouble(pinnedHash(id)+1)/2^63
    * — ONE int→double rounding then an exact power-of-two scale, and q one
    * IEEE division; every arithmetic step is bit-reproducible in any
    * engine (same discipline as [[Sketch.kmvDistinct]]), so an SQL oracle
    * replays the exact sample and estimators, and the sample is stable
    * across runs/partitionings. Scale shape: q is a row-local projection;
    * the rank limit plans as partial+final WindowGroupLimit, so ≤ k+1 rows
    * per group leave each map task regardless of corpus size; τ is a
    * ≤|groups|-row broadcast.
    *
    * Weights must be positive (w ≤ 0 never enters the sample: q ≤ 0 while
    * genuine priorities are > 0; such rows also contribute nothing to a
    * subset sum a caller would estimate). */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
      groupCols: Seq[String] = Nil, tag: String = "psamp"): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val u = (Sketch.pinnedHash(col(idCol).cast(StringType), tag) + lit(1L))
      .cast(DoubleType) /
      lit(9223372036854775808.0) // 2^63: exact double, exact scale
    // output contract: a double `w` weight column plus sample_rank /
    // est_w / tau — an input column literally named "w" is replaced by
    // the (cast) weight rather than duplicated
    val keep = df.columns.filterNot(_ == "w").map(col).toSeq
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__q").desc, col(idCol))
    val ranked = df
      .select(keep :+ weight.cast(DoubleType).as("__w"): _*)
      .withColumn("__q", col("__w") / u)
      .withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= k + 1)
    val tau = ranked.groupBy(groupCols.map(col): _*)
      .agg(max(when(col("__rk") === k + 1, col("__q"))).as("__tau"))
    val sampled = ranked.filter(col("__rk") <= k)
    val joined =
      if (groupCols.isEmpty) sampled.crossJoin(broadcast(tau))
      else sampled.join(broadcast(tau), groupCols)
    joined.select(keep ++ Seq(col("__w").as("w"),
      col("__rk").as("sample_rank"),
      greatest(col("__w"), coalesce(col("__tau"), col("__w"))).as("est_w"),
      col("__tau").as("tau")): _*)
  }

  /** Deterministic training-shard assignment: fingerprint(id) mod
    * nShards. Same reproducibility contract as [[splitBucket]] — no RNG,
    * engine-replayable, stable under re-partitioning and incremental
    * growth (a new doc never moves an old doc's shard). The physical
    * write is `df.repartition(nShards, shardOf(...)).sortWithinPartitions
    * (id)` + write: byte-identical shards from any cluster layout. */
  def shardOf(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    TextOps.fingerprint(id.cast(StringType)) % nShards
  }

  /** Epoch-varying within-shard training ORDER: fingerprint("e<epoch>:id").
    *
    * A trainer wants each shard read in pseudo-random order (ids
    * correlate with crawl time/source, so id order is NOT shuffled), and
    * wants a DIFFERENT permutation each epoch — without rewriting a
    * single byte of the corpus. Sorting a shard by this key delivers
    * both: deterministic (no RNG — the same epoch replays identically on
    * any cluster layout, and an SQL oracle can replay it), and the salt
    * prefix decorrelates epochs (changing `e1:` -> `e2:` reseeds the
    * whole polynomial, so the two epoch orders share no structure).
    * Scale shape: the sort is per-shard; reading top-k heads through a
    * rank filter plans as WindowGroupLimit (per-partition prune before
    * the one exchange), never a global sort of the corpus. */
  def epochOrder(id: Column, epoch: Int): Column =
    TextOps.fingerprint(concat(lit(s"e$epoch:"), id.cast(StringType)))

  /** Shard MANIFEST — the verification artifact a reproducible output
    * stage publishes next to the shards: per shard, row count, token
    * count, id range, and an order-independent content checksum (the
    * SUM of per-row fingerprints of `id:text`, so the manifest is
    * invariant to partition layout and task scheduling; each row term is
    * < 1e9, so a BIGINT sum is exact past 9e9 rows per shard). Consumers
    * re-derive the manifest after download/compaction and diff — any
    * dropped, duplicated, or bit-flipped row moves the checksum. One
    * scan + a nShards-group aggregate: free at any scale. */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    df.select(shardOf(col(idCol), nShards).as("shard"),
        col(idCol).as("__id"),
        TextOps.tokenCount(col(textCol)).as("__ntok"),
        TextOps.fingerprint(
          concat(col(idCol).cast(StringType), lit(":"), col(textCol)))
          .as("__rowfp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"),
        sum(col("__rowfp")).as("content_sum"))
}
