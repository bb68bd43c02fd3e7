package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy on the full text (one shuffle on the dedup key);
  *  - n-gram Jaccard: inverted-index self-join on shingles — NO cross join;
  *    candidate pairs only exist where a shingle is shared, so the shuffle
  *    is proportional to the posting lists, and a blocking key (source,
  *    lang, length bucket) bounds the worst case;
  *  - MinHash+LSH: k permutations via seeded xxhash64, banded into
  *    buckets; candidate pairs come from an equi-join on (band, bucket
  *    hash) — the classic sub-quadratic near-dup path;
  *  - SimHash: 64-bit fingerprints joined on 16-bit bands (3 distance
  *    blocks tolerate hamming<=3 by pigeonhole).
  */
object Dedup {

  /** Exact dedup: canonical (min id) representative per distinct text.
    * One shuffle, partial-aggregated map-side. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Exact-duplicate row filter: keep only each text's canonical row. */
  def dropExactDups(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val canon = exact(docs, textCol, idCol).select(col("canonical_id").as(idCol))
    docs.join(canon, Seq(idCol), "left_semi")
  }

  /** Incremental-ingest dedup — the production flow for a growing corpus:
    * drop incoming rows whose text already exists in the corpus
    * (left_anti on the text key; the corpus side is only scanned for its
    * projected key column, never rewritten), then exact-dedup within the
    * incoming batch itself. At 100 TB the anti-join prunes with a runtime
    * bloom filter / DPP under AQE; pair with [[TextOps.normalizeText]] on
    * both sides so formatting variants collapse. */
  def dropIncrementalDups(incoming: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String): DataFrame =
    dropExactDups(
      incoming.join(corpus.select(col(textCol)), Seq(textCol), "left_anti"),
      textCol, idCol)

  /** Bloom-prefiltered incremental dedup — same OUTPUT as
    * [[dropIncrementalDups]] (the sketch has no false negatives, and the
    * maybe-set is re-verified exactly), different 100 TB cost: a bloom of
    * the corpus keys replaces the full anti-join for the overwhelming
    * majority of incoming rows. Rows the sketch rules out (most of a
    * typical ingest) never shuffle at all — they pass through a codegen'd
    * predicate; only the sketch's maybe-set (true dups + ~fpp false
    * positives) joins against the corpus for exact verification. The
    * corpus is scanned once to build the sketch (a partial-merged
    * kilobytes-per-task aggregate) instead of being shuffled under a
    * join build side.
    *
    * `expectedCorpusItems` sizes the sketch; pass the known corpus
    * cardinality (or an upper bound). Falls back to [[dropIncrementalDups]]
    * when the corpus is empty. */
  def dropIncrementalDupsBloom(incoming: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, expectedCorpusItems: Long,
      fpp: Double = 0.01): DataFrame =
    Sketch.bloomBytes(corpus.select(col(textCol)), col(textCol),
        expectedCorpusItems, fpp) match {
      case None => dropExactDups(incoming, textCol, idCol)
      case Some(bloom) =>
        val probe = Sketch.mightContain(bloom, col(textCol))
        val definitelyNew = incoming.filter(!probe)
        val verified = incoming.filter(probe)
          .join(corpus.select(col(textCol)), Seq(textCol), "left_anti")
        dropExactDups(definitelyNew.unionByName(verified), textCol, idCol)
    }

  /** Distinct-shingle posting list per doc: (id, block, shingle). */
  private def shingleIndex(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int): DataFrame =
    docs.select(col(idCol), col(blockCol).as("block"),
        explode(array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), n))).as("shingle"))

  /** Exact-duplicate group tagging for the fuzzy-dedup miners: every row
    * gets `__rep` (min id among rows with bitwise-identical
    * (blockCols, textCol)) and `__gn` (group size) via one partitioned
    * window — one shuffle on the dedup key, no join.
    *
    * Why: real corpora are duplicate-heavy, and every pairwise miner's
    * candidate space grows QUADRATICALLY in dup-group depth (a text
    * replicated d times puts d copies in every band bucket / posting
    * list -> d^2/2 candidate pairs that all verify identically). Running
    * the miner over distinct texts and expanding member pairs back with
    * linear joins produces the IDENTICAL result set — identical texts
    * share all shingles and signatures, so their pairwise scores are the
    * constants the expansion emits — at per-distinct-text cost. This is
    * the standard exact-before-fuzzy dedup ordering, fused into one call. */
  private def tagExactDupGroups(docs: DataFrame, textCol: String,
      idCol: String, blockCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((blockCols :+ textCol).map(col): _*)
    docs.withColumn("__rep", min(col(idCol)).over(w))
      .withColumn("__gn", count(lit(1)).over(w))
  }

  /** Pairwise n-gram Jaccard similarity via inverted-index join.
    * Output: (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b,
    * only pairs sharing >=1 shingle within the same block.
    *
    * `maxDocFreq`: the 100 TB skew guard — a shingle appearing in d docs
    * of a block contributes d^2/2 candidate pairs, so one hot shingle
    * (boilerplate, license headers) can dominate the join. Capping drops
    * hot shingles from the SHINGLE UNIVERSE (standard prefix-filtering
    * practice): candidates, `inter`, and the sizes all count surviving
    * shingles only, so the reported jaccard is exact over that reduced
    * universe and internally consistent. Pairs whose only shared
    * shingles were hot are missed; the default (None) stays exact over
    * all shingles; at scale pick a cap ~100-1000. */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int, maxDocFreq: Option[Long] = None): DataFrame = {
    // Exact-dup collapse (see tagExactDupGroups): the inverted index and
    // the pair join run over DISTINCT (block, text) representatives only.
    val tagged = tagExactDupGroups(
      docs.select(col(idCol), col(blockCol), col(textCol)), textCol, idCol,
      Seq(blockCol))
    val reps = tagged.filter(col(idCol) === col("__rep"))
    val members = tagged.select(col(idCol), col("__rep"))
    // Shingles join as xxhash64 longs, not strings: 8-byte keys instead of
    // ~n-token strings in the join's build side. A cross-doc collision
    // within a block needs ~2^32 distinct shingles to become likely.
    // (Carrying per-doc sizes through the big join instead of re-joining
    // them after aggregation was tried and measured 2x SLOWER — the sizes
    // recompute is a narrow scan, the big join's width is what matters.)
    val idx0 = shingleIndex(reps, textCol, idCol, blockCol, n)
      .withColumn("shingle", xxhash64(col("shingle")))
    val idx = maxDocFreq match {
      case Some(cap) =>
        // doc frequency counts MEMBER docs (weight = group size), so the
        // hot set — and therefore the result — is identical to the
        // uncollapsed formulation
        val weights = reps.select(col(idCol), col("__gn"))
        val hot = idx0.join(weights, Seq(idCol))
          .groupBy(col("block"), col("shingle"))
          .agg(sum(col("__gn")).as("df")).filter(col("df") > cap)
          .select(col("block"), col("shingle"))
        idx0.join(hot, Seq("block", "shingle"), "left_anti")
      case None => idx0
    }
    // sizes over the SAME (possibly capped) universe as `inter`, so the
    // jaccard denominator and numerator agree
    val sizes = idx.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val a = idx.select(col(idCol).as("id_a"), col("block"), col("shingle"))
    val b = idx.select(col(idCol).as("id_b"), col("block"), col("shingle"))
    val inter = a.join(b, Seq("block", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val repPairs = inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("size_a") + col("size_b") - col("inter")).cast(DoubleType))
    // linear expansion: member pairs inherit their groups' scores; sizes
    // swap with the id ordering (size_a belongs to the smaller id's doc)
    val ma = members.select(col("__rep").as("id_a"), col(idCol).as("__ia"))
    val mb = members.select(col("__rep").as("id_b"), col(idCol).as("__ib"))
    val cross = repPairs.join(ma, "id_a").join(mb, "id_b")
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("inter"),
        when(col("__ia") < col("__ib"), col("size_a")).otherwise(col("size_b")).as("size_a"),
        when(col("__ia") < col("__ib"), col("size_b")).otherwise(col("size_a")).as("size_b"),
        col("jaccard"))
    // intra-group pairs: identical texts share every (surviving) shingle —
    // inter = size_a = size_b = the rep's shingle count; groups whose rep
    // lost all shingles (short docs, or all-hot under the cap) never pair,
    // exactly as in the uncollapsed join
    val g = reps.filter(col("__gn") >= 2)
      .join(sizes, Seq(idCol))
      .select(col(idCol).as("__g"), col("n_shingles").as("__s"))
    val ia = members.select(col("__rep").as("__g"), col(idCol).as("id_a"))
    val ib = members.select(col("__rep").as("__g"), col(idCol).as("id_b"))
    val intra = g.join(ia, "__g").join(ib, "__g")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__s").as("inter"),
        col("__s").as("size_a"), col("__s").as("size_b"),
        (col("__s").cast(DoubleType) /
          (col("__s") + col("__s") - col("__s")).cast(DoubleType)).as("jaccard"))
    cross.unionByName(intra)
  }

  /** n-gram CONTAINMENT via the same inverted-index join as
    * [[ngramJaccard]]: containment = inter / min(size_a, size_b). The
    * asymmetric near-dup signal — a snippet quoted whole inside a long
    * doc scores ~1 here while its Jaccard (inter / union) stays near
    * size_small/size_big, so symmetric thresholds miss it. Standard for
    * quote/excerpt/subset detection in corpus curation (and the signal
    * behind "is doc A a crawl of a page containing doc B").
    * Output adds `containment` to the [[ngramJaccard]] columns; same
    * cost, same `maxDocFreq` hot-shingle guard. */
  def ngramContainment(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int, maxDocFreq: Option[Long] = None): DataFrame =
    ngramJaccard(docs, textCol, idCol, blockCol, n, maxDocFreq)
      .withColumn("containment",
        col("inter").cast(DoubleType) /
          least(col("size_a"), col("size_b")).cast(DoubleType))

  /** A seeded hash family for minhash permutations. `prepare` names
    * columns computed ONCE per exploded (id, shingle) row — the place for
    * anything the k seeds share (a fingerprint fold, a pow-table lookup);
    * `hash(c, j)` builds seed j's hash from them (`c` resolves a prepared
    * column by name, or `"shingle"` itself). Aggregate input expressions
    * do not share subexpressions across the k `min`s, so work not hoisted
    * into `prepare` runs k times per shingle. */
  final case class MinhashFamily(
      prepare: org.apache.spark.sql.Column => Seq[(String, org.apache.spark.sql.Column)],
      hash: (String => org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column,
      /** Row-local whole-signature kernel (shingleArray, k) → array(k) of
        * the seed minima, when the family has a native one-pass form.
        * [[minhashSignatures]] then signs each doc in a single projection
        * — no explode, no aggregate, no exchange (§2.4: the signature is
        * a pure per-row function; only downstream banding ever shuffles,
        * and it carries k longs per doc either way). */
      sigArray: Option[(org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column] = None)

  object MinhashFamily {
    /** Default: seeded xxhash64 — one codegen'd call per seed, nothing to
      * share. */
    val xxhash: MinhashFamily =
      MinhashFamily(_ => Nil, (c, j) => xxhash64(lit(j), c("shingle")))

    /** Oracle-replayable polynomial family h_j(s) = fp(j + ":" + s): the
      * fingerprint loop and 31^len power run once per shingle
      * (TextOps.fingerprintParts); each seed is two multiplies and a mod.
      * Carries the native one-pass kernel (graft_minhash_sig), bit-equal
      * by differential spec. */
    val polynomial: MinhashFamily = MinhashFamily(
      TextOps.fingerprintParts,
      (c, j) => TextOps.prefixedFingerprintFromParts(s"$j:", c("fp"), c("pw")),
      sigArray = Some((sh, k) => graft.expr.TextExpressions.minhashSigs(sh, k)))
  }

  /** k MinHash signatures: minhash_j = min over distinct shingles of
    * hash_j(shingle). Seeded by the permutation index — deterministic
    * across runs/partitions. Output: id + `sig` array(k).
    *
    * Shape: explode shingles once, project the family's shared columns
    * once per row, then k `min` aggregates — the min combines map-side so
    * the shuffle carries k longs per doc, and the shingle array is
    * computed exactly once (a pure-HOF formulation gets its shingle
    * subtree inlined into every lambda by ProjectCollapse: measured 16x
    * recompute). Docs with fewer than shingleN tokens have no shingles and
    * drop out (they cannot near-dup match). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int,
      shingleN: Int,
      family: MinhashFamily = MinhashFamily.xxhash): DataFrame =
    family.sigArray match {
      case Some(mk) =>
        // native one-pass kernel: the signature is a pure per-row
        // function of the shingle set, so the whole computation is one
        // narrow projection — no explode row per shingle, no per-doc
        // hash-aggregate, no exchange. The size>=1 filter mirrors the
        // explode form exactly (explode drops empty arrays, so shingle-
        // less docs never reached the aggregate).
        docs.select(col(idCol), array_distinct(
            TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)).as("__sh"))
          .filter(size(col("__sh")) >= 1)
          .select(col(idCol), mk(col("__sh"), k).as("sig"))
      case None =>
        val exploded = docs.select(col(idCol),
          explode(array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)))
            .as("shingle"))
        val prepared = exploded.select(
          col(idCol) +: col("shingle") +:
            family.prepare(col("shingle")).map { case (n, c) => c.as(n) }: _*)
        val minCols = (0 until k).map(j => min(family.hash(col, j)).as(s"m$j"))
        prepared.groupBy(col(idCol))
          .agg(minCols.head, minCols.tail: _*)
          .select(col(idCol), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
    }

  /** O(churn) maintenance of a MATERIALIZED signature index (the table
    * [[minhashSignatures]] computes and [[nearDupsAgainstIndex]] probes)
    * from a CDC change set ([[Diff.snapshotDiff]] shape: added/changed
    * rows carry the new text in `<textCol>_new`): unchanged signatures
    * are carried forward untouched, removed/changed ids leave, and ONLY
    * added/changed texts are ever re-shingled and re-hashed. A signature
    * is a pure per-row function of the text, so maintained ≡
    * [[minhashSignatures]] of the full new release, bit for bit — the
    * `q_lsh_maintain` graded property. With [[Similarity.ivfIndexMaintain]]
    * (ANN index), [[Diff.maintainAgg]] (rollups) and
    * [[Diff.applyChangesScd2]] (history) this makes the nightly refresh
    * O(churn) for the dedup index too: a 100 TB corpus's standing LSH
    * index never re-reads the unchanged docs. A changed text that falls
    * below shingleN tokens leaves the index (exactly as a recompute
    * would drop it). */
  def minhashIndexMaintain(oldIndex: DataFrame, changes: DataFrame,
      textCol: String, idCol: String, k: Int, shingleN: Int,
      family: MinhashFamily = MinhashFamily.xxhash): DataFrame = {
    val gone = changes.filter(col("change").isin("removed", "changed"))
      .select(col(idCol))
    val touched = changes.filter(col("change").isin("added", "changed"))
      .select(col(idCol), col(textCol + "_new").as(textCol))
    oldIndex.join(gone, Seq(idCol), "left_anti")
      .unionByName(minhashSignatures(touched, textCol, idCol, k, shingleN, family))
  }

  /** (id, band, bucket) rows for a signature table: the k-long signature
    * split into `bands` groups of k/bands values, each band's raw minhash
    * tuple rendered as the bucket key — no second hash, so the banding is
    * independent of the signature hash function (and directly mirrorable
    * by an SQL oracle). */
  def minhashBandBuckets(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      val elems = (0 until r).map(j => element_at(col("sig"), b * r + j + 1))
      struct(lit(b).as("band"), concat_ws(",", elems: _*).as("bucket"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs: equi-join band buckets against themselves.
    * Sub-quadratic ACROSS buckets: only docs agreeing on a full band
    * ever meet — but quadratic WITHIN a bucket, and exact-dup collapse
    * (upstream) only removes byte-identical texts: a boilerplate-heavy
    * corpus can still land millions of near-identical, non-equal docs
    * in one band bucket, turning that bucket into a d²/2 pair bomb.
    *
    * `maxBucketSize` is the hot-bucket guard (the LSH analogue of
    * [[ngramJaccard]]'s `maxDocFreq` / fuzzyJoin's `maxGramFreq`): a
    * bucket with more than `cap` members emits the STAR of its minimum
    * id (member ↔ bucket-min, d−1 pairs) instead of all pairs. The
    * star keeps every hot-bucket member CONNECTED through the bucket
    * min, so transitive consumers ([[connectedComponents]] clustering,
    * keep-best dedup) see the same components; only the direct
    * pairwise candidates among hot-bucket co-members are not emitted
    * (verification never scores them). Normal buckets are untouched,
    * and the default (None) emits the exact classical candidate set. */
  def minhashLshCandidates(sigs: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucketSize: Option[Long] = None): DataFrame = {
    val buckets = minhashBandBuckets(sigs, idCol, k, bands)
    maxBucketSize match {
      case None =>
        val a = buckets.select(col(idCol).as("id_a"), col("band"), col("bucket"))
        val b2 = buckets.select(col(idCol).as("id_b"), col("band"), col("bucket"))
        a.join(b2, Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
      case Some(cap) =>
        require(cap >= 2, s"minhashLshCandidates: maxBucketSize must be >= 2, got $cap")
        // one partial-merged pass sizes every bucket and names its min
        // id; the all-pairs join then runs over the SMALL buckets only,
        // while each hot bucket expands linearly as (min, member) stars
        val sized = buckets.join(
          buckets.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("__bn"), min(col(idCol)).as("__bmin")),
          Seq("band", "bucket"))
        val cold = sized.filter(col("__bn") <= cap)
        val a = cold.select(col(idCol).as("id_a"), col("band"), col("bucket"))
        val b2 = cold.select(col(idCol).as("id_b"), col("band"), col("bucket"))
        val coldPairs = a.join(b2, Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        val hotStars = sized.filter(col("__bn") > cap && col(idCol) =!= col("__bmin"))
          .select(col("__bmin").as("id_a"), col(idCol).as("id_b"))
        coldPairs.unionByName(hotStars).distinct()
    }
  }

  /** Full MinHash near-dup pipeline: signatures -> LSH candidates ->
    * exact Jaccard verification >= threshold. The signature table is
    * pinned via an EAGER localCheckpoint for its three consumers in the
    * one result plan — not `cache()`: a CacheManager entry holds a
    * strong plan-keyed reference that only `clearCache()`/`unpersist`
    * releases, so a library user composing many pipelines would
    * accumulate pinned storage. Checkpoint blocks carry no catalog
    * entry and the ContextCleaner frees them as soon as the caller
    * drops the result — repeated calls are storage-flat by contract
    * (spec-gated). Cost: the signature job runs at call time, which
    * its three consumers need materialized anyway. */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      family: MinhashFamily = MinhashFamily.xxhash,
      // hot-bucket guard, see minhashLshCandidates: capped buckets emit
      // min-id stars, so CLUSTERING consumers are unaffected while the
      // direct pair list within a hot bucket is star-shaped
      maxBucketSize: Option[Long] = None): DataFrame = {
    // Exact-dup collapse (see tagExactDupGroups): signatures, banding and
    // verification run over DISTINCT texts; member pairs expand back
    // linearly. Identical texts have identical signatures, so every
    // intra-group pair is a guaranteed candidate (all bands collide) with
    // est_jaccard exactly k/k = 1.0 — the constants the expansion emits.
    val tagged = tagExactDupGroups(docs.select(col(idCol), col(textCol)),
      textCol, idCol, Nil).localCheckpoint()
    val reps = tagged.filter(col(idCol) === col("__rep"))
    val members = tagged.select(col(idCol), col("__rep"))
    val sigs = minhashSignatures(reps, textCol, idCol, k, shingleN, family)
      .localCheckpoint()
    val cands = minhashLshCandidates(sigs, idCol, k, bands, maxBucketSize)
    // verify candidates with estimated Jaccard from the full signatures
    val sa = sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    val repPairs = cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    val ma = members.select(col("__rep").as("id_a"), col(idCol).as("__ia"))
    val mb = members.select(col("__rep").as("id_b"), col(idCol).as("__ib"))
    val cross = repPairs.join(ma, "id_a").join(mb, "id_b")
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("est_jaccard"))
    // intra-group pairs exist only when the rep actually has a signature
    // (>= shingleN tokens) — shorter docs never enter the pipeline
    val g = tagged.filter(col(idCol) === col("__rep") && col("__gn") >= 2)
      .join(sigs.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__g"))
    val ia = members.select(col("__rep").as("__g"), col(idCol).as("id_a"))
    val ib = members.select(col("__rep").as("__g"), col(idCol).as("id_b"))
    val intra = g.join(ia, "__g").join(ib, "__g")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (lit(k).cast(DoubleType) / k).as("est_jaccard"))
    cross.unionByName(intra).filter(col("est_jaccard") >= threshold)
  }

  /** Connected components over an undirected candidate-pair graph — the
    * final stage of a near-dup pipeline: LSH/Jaccard emit PAIRS, but a
    * near-duplicate set is the transitive closure of those pairs (a and c
    * are dups when a~b and b~c even if a,c never met in a band). Output:
    * one (id, root) row per node appearing in `pairs`, root = min id of
    * the node's component (deterministic canonical representative).
    *
    * Shape: iterative hash-min label propagation with pointer jumping —
    * each round first lowers every node's label to the min over its
    * neighbors' labels, then short-circuits label chains by one hop
    * (label := label(label)) (cf. Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SOCC'14 — this is the hash-min variant).
    * Jumping squares label chains, so rounds are ~O(log d) when the
    * chains mirror the graph (monotone-ish id layouts — the common
    * dedup case of tiny cliques/chains); on adversarial layouts the min
    * frontier can still walk ~one hop per round, so if `maxRounds`
    * expires UNCONVERGED the remainder is finished exactly by
    * [[connectedComponentsStar]] (diameter-independent round bound) on
    * the label-contracted graph — never a silently-unconverged result.
    * Each round is two shuffles proportional to |edges| + |nodes|;
    * labels are localCheckpoint'ed per round so the iterative plan does
    * not accumulate lineage. Candidate graphs are sparse (LSH emits
    * ~dup pairs, not the corpus), so |nodes| ≪ corpus. Convergence is
    * detected exactly (a round that changes no label ends the loop). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 25, smallGraphLimit: Long = 1L << 20): DataFrame = {
    // ids keep their natural type — min/least need only an ordering, and
    // a long cast would null out string/hash ids and silently no-op the
    // whole clustering. Null-id edges drop up front: a null can't identify
    // a node, and the two paths would otherwise diverge on them (driver
    // compareTo NPEs; distributed joins silently never match nulls).
    val sym = pairs.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    // SMALL-GRAPH FAST PATH — same driver-side pattern as the IVF Lloyd
    // fit and the BPE merge loop: near-dup candidate graphs are pairs of
    // DUPS, not the corpus, so they are usually tiny even when the corpus
    // is 100 TB. Below the bound (~tens of MB collected), union-find on
    // the driver replaces ~2 shuffles × O(log diameter) rounds of Spark
    // jobs with ONE collect — identical output (min-id component root;
    // the distributed path stays spec-equivalent via the
    // random-vs-union-find differential). The count is free: edges is
    // already materialized by the localCheckpoint above.
    //
    // Only id types whose DRIVER ordering provably matches Spark's `min`
    // take the fast path: integral types (same total order), and strings
    // compared as unsigned UTF-8 bytes (Spark's UTF8String order — Java
    // String.compareTo disagrees beyond the BMP, and Array[Byte] isn't
    // Comparable at all). Anything else stays on the distributed path,
    // which orders every Spark type natively.
    val idTypeFastOrderable = edges.schema.fields(0).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    val edgeCount = edges.count()
    if (idTypeFastOrderable && edgeCount <= smallGraphLimit) {
      val parent = new java.util.HashMap[Any, Any]()
      def find(x0: Any): Any = {
        var x = x0
        var p = parent.get(x)
        while (p != null && p != x) { // path halving
          val gp = parent.get(p)
          if (gp != null && gp != p) parent.put(x, gp)
          x = if (gp != null) gp else p
          p = parent.get(x)
        }
        x
      }
      @inline def lt(a: Any, b: Any): Boolean = (a, b) match {
        case (x: String, y: String) => // Spark UTF8String order = unsigned UTF-8 bytes
          val (xb, yb) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
          var i = 0
          val n = math.min(xb.length, yb.length)
          var r = 0
          while (r == 0 && i < n) { r = (xb(i) & 0xFF) - (yb(i) & 0xFF); i += 1 }
          if (r != 0) r < 0 else xb.length < yb.length
        case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      }
      val rows = edges.collect()
      rows.foreach { r =>
        val (a, b) = (r.get(0), r.get(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
      val it = parent.keySet().iterator()
      while (it.hasNext) {
        val id = it.next()
        out.add(org.apache.spark.sql.Row(id, find(id)))
      }
      val idType = edges.schema.fields(0).dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("root", idType)))
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(edges)
      return pairs.sparkSession.createDataFrame(out, schema)
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("root")).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // min label over neighbors (edges are symmetric so one direction sees all)
      val viaNbr = edges
        .join(labels.select(col("id").as("dst"), col("root").as("nroot")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("nroot")).as("nroot"))
      val lowered = labels.join(viaNbr, Seq("id"), "left")
        .select(col("id"), least(col("root"), coalesce(col("nroot"), col("root"))).as("root"),
          col("root").as("prev"))
      // pointer jump: every label is itself a node id, so follow it one hop
      val parents = lowered.select(col("id").as("pid"), col("root").as("proot"))
      // convergence rides the same checkpointed pass (a local scan of the
      // materialized round, not an extra join job)
      val jumped = lowered.join(parents, lowered("root") === parents("pid"))
        .select(lowered("id"), col("proot").as("root"),
          (col("proot") =!= col("prev")).as("changed"))
        .localCheckpoint()
      converged = jumped.filter(col("changed")).isEmpty
      if (sys.env.contains("GRAFT_CC_TRACE"))
        System.err.println(s"[cc] round=$round converged=$converged n=${jumped.count()}")
      // the superseded round's checkpoint blocks are dead as soon as the
      // next round materializes — free them instead of pinning 25 rounds
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(labels)
      labels = jumped.select(col("id"), col("root"))
      round += 1
    }
    if (!converged) {
      // Hash-min + jumping is O(log d) only when the label chains mirror
      // the graph (monotone-ish id layouts — the common dedup case); on
      // an ADVERSARIAL layout (e.g. a path with shuffled ids) the min
      // frontier walks ~one hop per round and maxRounds can expire with
      // labels still moving. Returning them would be SILENTLY WRONG —
      // instead finish EXACTLY: contract edges through the current
      // labels (label values stay within their component, so components
      // are preserved) and run star contraction — whose round bound is
      // diameter-independent — on the much smaller contracted graph,
      // then compose the two label maps.
      val contracted = edges
        .join(labels.select(col("id").as("src"), col("root").as("ca")), Seq("src"))
        .join(labels.select(col("id").as("dst"), col("root").as("cb")), Seq("dst"))
        .select(col("ca"), col("cb"))
        .filter(col("ca") =!= col("cb"))
      val starRoots = connectedComponentsStar(contracted, "ca", "cb")
        .select(col("id").as("__sid"), col("root").as("__sroot"))
      val composed = labels.join(starRoots, labels("root") === col("__sid"), "left")
        .select(labels("id"), coalesce(col("__sroot"), labels("root")).as("root"))
        .localCheckpoint()
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(labels)
      labels = composed
    }
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(edges)
    labels
  }

  /** Connected components via ALTERNATING LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14, Alg. 2) — the variant for HIGH-DIAMETER graphs.
    * [[connectedComponents]]'s hash-min + pointer-jumping is the right
    * default for dedup graphs (tiny cliques/chains), but its per-round
    * work touches every edge for O(log d) rounds; star contraction
    * instead REWRITES the edge set toward two-level stars, with the
    * paper's O(log² n) round bound independent of diameter and
    * monotonically shrinking the active edge set on path/tree-like
    * graphs. Same output contract: one (id, root) row per node of
    * `pairs`, root = component min (Spark ordering; self-loop-only nodes
    * root to themselves). Each phase is one groupBy-min plus an
    * edge-sized join, checkpointed per round; convergence = stable
    * canonical edge set (count + order-free hash, exact count always
    * re-checked), bounded by `maxRounds`. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    val base = pairs.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("u"), col(bCol).as("v"))
    val sym = base.union(base.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val nodes = sym.select(col("u").as("id")).distinct().localCheckpoint()
    var edges = sym.filter(col("u") =!= col("v")).localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      // every node u sees all neighbors; strictly larger neighbors
      // reconnect to m = min(N(u) ∪ {u})
      val e2 = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = e2.groupBy(col("u")).agg(min(col("v")).as("mn"))
      e2.join(mins, Seq("u"))
        .select(col("u"), col("v"), least(col("mn"), col("u")).as("m"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // attach each edge to its larger endpoint; all of u's smaller
      // neighbors (and u) reconnect to their min
      val directed = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val withM = directed.join(
        directed.groupBy(col("u")).agg(min(col("v")).as("m")), Seq("u"))
      withM.select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // canonical-set signature: exact count + order-free hash XOR (no
    // ANSI overflow, unlike a sum). The loop only STOPS on a signature
    // match (a collision would stop one round early on an
    // almost-converged set; maxRounds bounds it anyway)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(greatest(u, v), least(u, v)))"),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var round = 0
    var converged = sig._1 == 0L
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nsig = signature(next)
      converged = nsig == sig
      org.apache.spark.sql.graftx.Bridge.freeCheckpoint(edges)
      edges = next
      sig = nsig
      round += 1
    }
    // converged edges are (child, component-min) stars
    val roots = edges
      .select(greatest(col("u"), col("v")).as("id"), least(col("u"), col("v")).as("root"))
      .groupBy(col("id")).agg(min(col("root")).as("root"))
    val out = nodes.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("root"))
      .localCheckpoint()
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(edges)
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(sym)
    org.apache.spark.sql.graftx.Bridge.freeCheckpoint(nodes)
    out
  }

  /** Near-dup row filter over a pair graph: drop every row of a component
    * except its canonical (min-id) representative; rows in no pair pass
    * through. The left_anti side is just the non-canonical cluster members
    * — tiny next to the corpus, so AQE broadcasts it. */
  def dropNearDupClusters(docs: DataFrame, pairs: DataFrame,
      aCol: String, bCol: String, idCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("root") =!= col("id")).select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Corpus DUPLICATION PROFILE — the health report run before deciding
    * dedup policy: component-size histogram of the near-dup graph, plus
    * the singleton row, so "what fraction of the corpus is duplicated,
    * and in how big clusters?" is one table. Cluster size 1 = docs in no
    * pair; size k ≥ 2 = a connected component of k near-dups (of which
    * k−1 would be dropped by [[dropNearDupClusters]]).
    *
    * Scale shape: components run over the PAIR GRAPH only (edges ≪
    * corpus); the singleton count is one anti-join aggregate; the
    * histogram is component-count-sized. Output: (cluster_size,
    * n_clusters, n_docs). */
  def dupProfile(docs: DataFrame, pairs: DataFrame,
      aCol: String, bCol: String, idCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val multi = comps.groupBy(col("root")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val singles = docs.select(col(idCol).as("id"))
      .join(comps.select(col("id")), Seq("id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"),
        col("n_clusters").as("n_docs"))
    multi.unionByName(singles).filter(col("n_clusters") > 0)
  }

  /** Near-dup collapse with a KEEP-BEST rule — the curation action after
    * clustering: from every near-dup cluster keep the single document
    * that maximizes `metric` (quality score, length, recency; ties to
    * the smallest id), and keep all singletons. This is the
    * representative-selection form of [[dropNearDupClusters]] (which
    * keeps the min-id doc regardless of quality).
    *
    * Scale shape: components run over the PAIR GRAPH only; the corpus
    * joins the (tiny) component table once — left join, so singletons
    * never shuffle into the window — and the per-cluster argmax is a
    * two-phase WindowGroupLimit (map-side top-1 before the exchange,
    * which carries only clustered docs). Output: the kept rows of
    * `docs` + `cluster_id` + `n_members`. */
  def keepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, metric: Column): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("root"))
    val sizes = comps.groupBy(col("root"))
      .agg(count(lit(1)).as("n_members")) // component-table sized
    val tagged = docs.join(comps, Seq(idCol), "left")
    val singles = tagged.filter(col("root").isNull)
      .withColumn("cluster_id", col(idCol))
      .withColumn("n_members", lit(1L)).drop("root")
    // row_number + rn=1 filter alone (no second window function) keeps
    // the WindowGroupLimit map-side top-1 pushdown; sizes join after
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("root")).orderBy(metric.desc, col(idCol).asc)
    val best = tagged.filter(col("root").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(sizes, Seq("root"))
      .withColumn("cluster_id", col("root"))
      .drop("root", "__rn")
    singles.unionByName(best)
  }

  /** Cross-corpus near-dup matching — DECONTAMINATION: find training
    * documents whose text near-duplicates an evaluation/benchmark set, so
    * they can be dropped before training. Same sub-quadratic LSH shape as
    * [[minhashNearDups]] but the band join runs BETWEEN the two corpora:
    * signatures are computed per side (the small eval side's signature
    * and bucket tables are broadcast-sized in practice), candidates are
    * (train, eval) bucket collisions only, and estimated Jaccard from the
    * full signatures gates the output. Ids need not be disjoint across
    * corpora. Output: (train_id, eval_id, est_jaccard). */
  def crossCorpusNearDups(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      family: MinhashFamily = MinhashFamily.xxhash): DataFrame = {
    val ts = minhashSignatures(train, textCol, idCol, k, shingleN, family)
      .select(col(idCol).as("train_id"), col("sig"))
    nearDupsAgainstIndex(evalSet, ts, textCol, idCol, threshold, k, bands,
        shingleN, family)
      .select(col("index_id").as("train_id"), col("probe_id").as("eval_id"),
        col("est_jaccard"))
  }

  /** EXACT n-gram collision decontamination (the GPT-3/PaLM eval-overlap
    * rule): a training doc is contaminated when it shares ANY exact token
    * n-gram with the eval set. Complements [[crossCorpusNearDups]] —
    * MinHash catches whole-doc near-dups; the n-gram rule catches a
    * verbatim eval QUOTE embedded in an otherwise-unrelated doc, which
    * whole-doc Jaccard dilutes below any usable threshold. Returns every
    * `train` row plus `n_collisions` (distinct shared n-grams, 0 for
    * clean) and `contaminated`.
    *
    * Shape (100 TB): both sides dedup their n-grams row-locally
    * (`array_distinct`, narrow) before exploding; the eval side collapses
    * to one distinct n-gram set — benchmark suites are millions of
    * n-grams vs trillions in the corpus, so AQE broadcasts it and the
    * train side never shuffles. The join key is the exact shingle string:
    * no hash false-positives in a correctness-critical gate. */
  def ngramCollisions(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 5): DataFrame = {
    require(n >= 1, s"ngramCollisions: n must be >= 1, got $n")
    def grams(d: DataFrame) =
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), n))
    val evalGrams = evalSet.select(explode(grams(evalSet)).as("__g")).distinct()
    val hits = train.select(col(idCol), explode(grams(train)).as("__g"))
      .join(evalGrams, Seq("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_collisions"))
    train.join(hits, Seq(idCol), "left")
      .withColumn("n_collisions", coalesce(col("n_collisions"), lit(0L)))
      .withColumn("contaminated", col("n_collisions") > 0)
  }

  /** Duplicated-SPAN statistics (the Lee et al. 2022 "Deduplicating
    * Training Data" signal, at sliding n-gram granularity): for each doc,
    * how many of its length-`n` token windows occur more than once in the
    * corpus (including again in the same doc) — the within-doc complement
    * is repetitionRatio; whole-doc near-dup is MinHash. Returns every doc
    * with `n_spans`, `n_dup_spans`, and `dup_ratio` (null when the doc is
    * shorter than n tokens). Docs with high dup_ratio carry boilerplate /
    * templated content that whole-doc dedup never removes.
    *
    * Shape (100 TB): windows explode once (native TokenShingles, narrow);
    * the frequency groupBy and the join back shuffle the 8-byte
    * polynomial FINGERPRINT of each window, not the window text — the
    * shuffle is ~30x lighter and the same hash family is engine-
    * replayable (fp collisions merge counts at ~n_distinct²/2e9
    * probability; a detection statistic tolerates that, and the oracle
    * replays the identical hashes). */
  def dupSpanStats(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 30): DataFrame = {
    require(n >= 1, s"dupSpanStats: n must be >= 1, got $n")
    val sh = docs.select(col(idCol),
      explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("__g"))
      .select(col(idCol), graft.expr.TextExpressions.fingerprint(col("__g")).as("__h"))
    val freq = sh.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
    val per = sh.join(freq, Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    docs.join(per, Seq(idCol), "left")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumn("n_dup_spans", coalesce(col("n_dup_spans"), lit(0L)))
      .withColumn("dup_ratio",
        when(col("n_spans") > 0,
          col("n_dup_spans").cast(org.apache.spark.sql.types.DoubleType) /
            col("n_spans")))
  }

  /** Duplicated-span REMOVAL — the Lee et al. 2022 ExactSubstr ACTION to
    * [[dupSpanStats]]'s signal: every token covered by ANY length-`n`
    * token window whose fingerprint occurs more than once in the corpus
    * (within-doc repeats included) is removed; the survivors re-join with
    * single spaces in their original order (overlapping duplicated spans
    * union, exactly like the paper's merged byte ranges). Docs shorter
    * than `n` tokens keep all their tokens.
    *
    * Shape (100 TB): the windows explode once and the frequency
    * groupBy + join-back shuffle the 8-byte polynomial fingerprint (as
    * [[dupSpanStats]]); duplicated window STARTS collapse to one small
    * per-doc array; coverage expansion (start → n positions) and the
    * token rebuild are ROW-LOCAL array passes. The rebuild probes
    * `array_contains` per token — O(|toks|·|covered|) per doc, fine
    * while covered spans are a minority (a mostly-duplicated doc should
    * fall to a dup_ratio gate first).
    *
    * Returns all docs with `<textCol>_trimmed` (canonical single-space
    * join) and `n_trimmed_tokens`. */
  def trimDupSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 30): DataFrame = {
    require(n >= 1, s"trimDupSpans: n must be >= 1, got $n")
    val sh = docs.select(col(idCol),
      posexplode(TextOps.shingles(TextOps.tokens(col(textCol)), n))
        .as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"),
        graft.expr.TextExpressions.fingerprint(col("__g")).as("__h"))
    val freq = sh.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
    val dupStarts = sh.join(freq, Seq("__h")).filter(col("__n") > 1)
      .groupBy(col(idCol)).agg(collect_set(col("__pos")).as("__starts"))
    val joined = docs.join(dupStarts, Seq(idCol), "left")
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__cov",
        when(col("__starts").isNull,
          array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType)))
          .otherwise(array_distinct(flatten(transform(col("__starts"),
            s => sequence(s, s + n - 1))))))
    val kept = filter(
      zip_with(col("__toks"), sequence(lit(0), size(col("__toks")) - 1),
        (t, i) => when(array_contains(col("__cov"), i), lit(null)).otherwise(t)),
      x => x.isNotNull)
    joined
      .withColumn("__kept", kept)
      .withColumn(textCol + "_trimmed", concat_ws(" ", col("__kept")))
      .withColumn("n_trimmed_tokens",
        (size(col("__toks")) - size(col("__kept")))
          .cast(org.apache.spark.sql.types.LongType))
      .drop("__starts", "__toks", "__cov", "__kept")
  }

  /** Drop contaminated training docs (see [[ngramCollisions]]) — the
    * anti-join form: train rows with no exact n-gram in the eval set. */
  def dropNgramContaminated(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 5): DataFrame = {
    def grams(d: DataFrame) =
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), n))
    val evalGrams = evalSet.select(explode(grams(evalSet)).as("__g")).distinct()
    train.join(
      train.select(col(idCol), explode(grams(train)).as("__g"))
        .join(evalGrams, Seq("__g")).select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  /** Match a new batch against a PERSISTED signature index — the
    * production incremental flow: `indexSigs` is a stored (train_id, sig)
    * table (compute once via [[minhashSignatures]], keep as parquet —
    * bucketed on the band key via TableIO.writeBucketed if the index is
    * re-probed often), so the heavy signature pass over the corpus is
    * paid ONCE, and each ingest batch only computes its own signatures
    * and joins the bands. Output: (index_id, probe_id, est_jaccard). */
  def nearDupsAgainstIndex(probe: DataFrame, indexSigs: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      family: MinhashFamily = MinhashFamily.xxhash): DataFrame = {
    val is = indexSigs.toDF(Seq("index_id", "sig"): _*)
    val ps = minhashSignatures(probe, textCol, idCol, k, shingleN, family)
      .select(col(idCol).as("probe_id"), col("sig"))
    val ib = minhashBandBuckets(is, "index_id", k, bands)
    val pb = minhashBandBuckets(ps, "probe_id", k, bands)
    val cands = ib.join(pb, Seq("band", "bucket"))
      .select("index_id", "probe_id").distinct()
    cands
      .join(is.select(col("index_id"), col("sig").as("sig_i")), "index_id")
      .join(ps.select(col("probe_id"), col("sig").as("sig_p")), "probe_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_i"), col("sig_p"), (x, y) => x === y), b => b))
          .cast(DoubleType) / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("index_id"), col("probe_id"), col("est_jaccard"))
  }

  /** SimHash fingerprints via explode + partial-aggregated bit counts —
    * the aggregate shape computes each token hash once (the pure-HOF
    * TextOps.simhash recomputes the token array per bit when projections
    * collapse; fine for a scalar call, wrong shape for a corpus pass).
    *
    * The 64 per-bit counters are packed 4-to-a-long (16-bit lanes holding
    * the count of set bits; lanes can't carry below 65k tokens/doc), so
    * the hash aggregate has 17 columns instead of 65 — the 64-sum codegen
    * was large enough to fall off the JIT in some runs (measured 2.9 s vs
    * 13 s bimodal). Bit rule unchanged: bit set iff ones > n/2, i.e. the
    * sign of sum(+/-1). */
  def simhashFingerprints(docs: DataFrame, textCol: String, idCol: String,
      tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash(col("tok")).as("h"))
    // group g packs bits (4g..4g+3) into lanes (0..3) of one long
    val packedSums = (0 until 16).map { g =>
      val packed = (0 until 4).map { l =>
        shiftleft(shiftrightunsigned(col("h"), 4 * g + l).bitwiseAND(lit(1L)), 16 * l)
      }.reduce((a, b) => a.bitwiseOR(b))
      sum(packed).as(s"g$g")
    }
    val aggd = exploded.groupBy(col(idCol))
      .agg(packedSums.head, (packedSums.tail :+ count(lit(1)).as("n")): _*)
    val bits = for (g <- 0 until 16; l <- 0 until 4) yield {
      val ones = shiftrightunsigned(col(s"g$g"), 16 * l).bitwiseAND(lit(0xFFFFL))
      when(ones * 2 > col("n"), lit(1L << (4 * g + l))).otherwise(lit(0L))
    }
    aggd.select(col(idCol), bits.reduce((a, b) => a.bitwiseOR(b)).as("fp"))
  }

  /** SimHash near-dup candidates: docs whose 64-bit fingerprints agree on
    * at least one of four 16-bit bands (pigeonhole: hamming<=3 guaranteed
    * caught). Verification filter on true hamming distance <= maxHamming. */
  /** 64 token-hash bits assembled from four 16-bit slices of the
    * polynomial fingerprint (g + ":" + token) — same mixing family the
    * SQL oracle can recompute; the library default stays xxhash64. */
  def polyTokenHash64(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 4).map { g =>
      // seeded single-loop fp: 4 small codegen loops per row — the
      // pow-table form's when+dual-loop codegen was measured to fall off
      // the JIT here (15 s vs 2 s on the simhash corpus pass)
      shiftleft(graft.expr.TextExpressions.seededFingerprint(t,
        TextOps.fingerprintOf(s"$g:")).bitwiseAND(lit(0xFFFFL)), 16 * g)
    }.reduce(_ bitwiseOR _)

  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int,
      tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    // Exact-dup collapse (see tagExactDupGroups): identical texts have
    // identical fingerprints — every band collides and the hamming is 0 —
    // so banding and verification run over DISTINCT texts and member
    // pairs expand back linearly with the constants the naive join emits.
    // The tag table is pinned with an EAGER localCheckpoint (same
    // rationale and lifetime contract as minhashNearDups): seven consumers
    // in the one result plan would otherwise re-execute the full-text
    // window shuffle wherever ReuseExchange cannot unify them. NB at high
    // dup depth this query is OUTPUT-bound — a corpus with d-deep dup
    // groups emits ~d^2/2 member pairs per near-dup group by definition —
    // and the measured per-pair emit cost stays flat (~6M pairs/s at
    // 585M pairs).
    val tagged = tagExactDupGroups(docs.select(col(idCol), col(textCol)),
      textCol, idCol, Nil).localCheckpoint()
    val reps = tagged.filter(col(idCol) === col("__rep"))
    val members = tagged.select(col(idCol), col("__rep"))
    val fps = simhashFingerprints(reps, textCol, idCol, tokenHash)
      .localCheckpoint()
    val banded = fps.select(col(idCol), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "key")))
    val a = banded.select(col(idCol).as("id_a"), col("fp").as("fp_a"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("id_b"), col("fp").as("fp_b"), col("band"), col("key"))
    val repPairs = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val ma = members.select(col("__rep").as("id_a"), col(idCol).as("__ia"))
    val mb = members.select(col("__rep").as("id_b"), col(idCol).as("__ib"))
    val cross = repPairs.join(ma, "id_a").join(mb, "id_b")
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("hamming"))
    // intra-group pairs: hamming 0; only for reps that HAVE a fingerprint
    // (>= 1 token — empty texts never enter the naive join either)
    val g = reps.filter(col("__gn") >= 2)
      .join(fps.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__g"))
    val ia = members.select(col("__rep").as("__g"), col(idCol).as("id_a"))
    val ib = members.select(col("__rep").as("__g"), col(idCol).as("id_b"))
    val intra = g.join(ia, "__g").join(ib, "__g")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // same expression type as the cross path (bit_count returns int)
        TextOps.hamming64(lit(0L), lit(0L)).as("hamming"))
    cross.unionByName(intra)
  }
}
