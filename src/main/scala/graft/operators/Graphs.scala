package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph operators for web-scale corpus curation: the crawl's domain
  * link graph ranks sources (PageRank), and the near-dup pair graph
  * carries labels from curated seeds onto unlabeled documents.
  *
  * Both follow the [[Dedup.connectedComponents]] machinery pattern:
  * driver-controlled rounds of join + partial-merged aggregate over the
  * EDGE list (edges ≪ corpus for both graphs), each round pinned with
  * localCheckpoint so lineage stays flat. No GraphX, no RDDs — every
  * round is a declarative plan Catalyst optimizes (AQE broadcasts the
  * rank table once it's small).
  */
object Graphs {

  /** PageRank over an edge list — domain authority for crawl curation
    * (rank sources before deciding per-domain caps/blocklists). Standard
    * power iteration with uniform teleport and dangling-mass
    * redistribution:
    *
    *   pr(v) = (1−d)/N + d·(dangling/N) + d·Σ_{u→v} pr(u)/outdeg(u)
    *
    * Fixed `iters` iterations (the production norm for domain ranking —
    * ranks stabilize long before convergence and a fixed unroll keeps
    * every output an explicit arithmetic expression an external oracle
    * can replay). Parallel edges collapse (distinct); self-loops count
    * like any edge. Per iteration: ONE join of the edge list with the
    * rank table + one partial-merged sum by dst — shuffles are
    * edge-count-sized, the dangling mass is a scalar aggregate collected
    * driver-side (like the per-round convergence check in
    * connectedComponents). Output: (id, pr), summing to 1 over nodes. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"pageRank: iters $iters")
    require(damping > 0 && damping < 1, s"pageRank: damping $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // deg null = dangling (no out-edges): its mass teleports uniformly
    val withDeg = nodes.join(outDeg, Seq("id"), "left").localCheckpoint()
    val n = withDeg.count()
    var pr = withDeg.select(col("id"), col("deg"), lit(1.0 / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val dangling = pr.filter(col("deg").isNull)
        .agg(coalesce(sum(col("pr")), lit(0.0))).head().getDouble(0)
      val contrib = e
        .join(pr.select(col("id").as("src"), (col("pr") / col("deg")).as("w")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("w")).as("inw"))
      val next = withDeg.join(contrib, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit((1 - damping) / n + damping * dangling / n) +
            lit(damping) * coalesce(col("inw"), lit(0.0))).as("pr"))
        .localCheckpoint()
      // free the superseded round's checkpoint blocks (see connectedComponents)
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(pr)
      pr = next
    }
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(e)
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(withDeg)
    pr.select(col("id"), col("pr"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over an edge list — the
    * other classic crawl-curation ranker next to [[pageRank]]: authority
    * scores feed fetch prioritization (which hosts to crawl deeper),
    * hub scores identify link farms / directory pages for capping.
    *
    * Update rule per iteration (standard order: authorities from the
    * PREVIOUS hubs, then hubs from the NEW authorities):
    *   auth(v) = Σ_{u→v} hub(u);   hub(u) = Σ_{u→v} auth(v)
    *
    * Deliberately UNNORMALIZED: with hub₀ = 1, every intermediate score
    * is a plain INTEGER (sums of counts of paths), so fixed-iteration
    * results are exact integer arithmetic — no per-iteration float
    * division, no summation-order drift, bit-identical on any engine
    * (normalization is a consumer-side ratio; rankings are unaffected).
    * Scores ACCUMULATE in DECIMAL(38,0) (a BIGINT sum would WRAP
    * silently under non-ANSI Spark — scores grow ~(max degree)² per
    * round, so deg-10⁶ hubs exceed 9e18 within 3 rounds) and the output
    * casts back to BIGINT; both a sum passing 1e38 and a final score
    * outside the BIGINT range fail LOUDLY via raise_error, never a
    * wrapped or nulled score. Parallel edges collapse (distinct); self-loops count
    * like any edge; nodes with no in-edges get authority 0, no
    * out-edges hub 0. Per half-step: ONE edge⋈score join + one
    * partial-merged sum — shuffles are edge-count-sized, nothing is
    * collected driver-side. Output: (id, hub, auth). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 20, s"hits: iters $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val dec = "decimal(38,0)"
    // A join MISS means "no in-/out-edges: score 0". A join HIT with a
    // null sum means the DECIMAL(38,0) accumulator overflowed (non-ANSI
    // sum nulls on overflow) — the __hit marker separates the two so
    // overflow raises instead of silently folding to 0.
    def folded(raw: DataFrame, scoreCol: String): DataFrame =
      nodes.join(raw.withColumn("__hit", lit(true)), Seq("id"), "left")
        .select(col("id"),
          when(col("__hit").isNull, lit(0L).cast(dec))
            .when(col(scoreCol).isNull, raise_error(lit(
              s"hits: DECIMAL(38,0) overflow in a $scoreCol sum — lower iters")))
            .otherwise(col(scoreCol)).as(scoreCol))
        .localCheckpoint()
    var hub = nodes.select(col("id"), lit(1L).cast(dec).as("hub")).localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e
        .join(hub.select(col("id").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("auth"))
      val nextAuth = folded(aRaw, "auth")
      if (auth != null) org.apache.spark.sql.graftx.Bridge.freeCheckpoint(auth)
      auth = nextAuth
      val hRaw = e
        .join(auth.select(col("id").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hub"))
      val nextHub = folded(hRaw, "hub")
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(hub)
      hub = nextHub
    }
    // output contract stays BIGINT; a score past the BIGINT range fails
    // loudly rather than null-casting
    def asLong(scoreCol: String) =
      when(col(scoreCol) > lit(Long.MaxValue) || col(scoreCol) < lit(Long.MinValue),
        raise_error(lit(s"hits: $scoreCol exceeds BIGINT — lower iters")))
        .otherwise(col(scoreCol).cast("long")).as(scoreCol)
    // hub/auth stay checkpointed (they back the result); the edge list
    // and node set are materialized into them and can release now
    val out = hub.join(auth, Seq("id"))
      .select(col("id"), asLong("hub"), asLong("auth"))
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(e)
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(nodes)
    out
  }

  /** One-hop label propagation over a pair graph — carry curated seed
    * labels (language, quality tier, license class) onto unlabeled
    * near-duplicates: an unlabeled node adopts the MAJORITY label among
    * its labeled neighbors, ties to the smallest label; seeds keep
    * theirs. One vote join + one partial-merged count + one per-node
    * rank (WindowGroupLimit pushes the top-1 before the shuffle) — all
    * sized by the pair graph, not the corpus. Output: `nodes` +
    * `label_out` (resolved label or null) + `label_source`
    * (seed / propagated / null). */
  def propagateLabels(nodes: DataFrame, idCol: String, labelCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sym = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val edges = sym.union(sym.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val seeds = nodes.select(col(idCol).as("v"), col(labelCol).as("__nl"))
      .filter(col("__nl").isNotNull)
    val votes = edges.join(seeds, Seq("v"))
      .groupBy(col("u"), col("__nl")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("u")).orderBy(col("__c").desc, col("__nl"))
    val best = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("u").as(idCol), col("__nl").as("__prop"))
    nodes.join(best, Seq(idCol), "left")
      .withColumn("label_out", coalesce(col(labelCol), col("__prop")))
      .withColumn("label_source",
        when(col(labelCol).isNotNull, "seed")
          .when(col("__prop").isNotNull, "propagated"))
      .drop("__prop")
  }
}
