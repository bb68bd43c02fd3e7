package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join helpers for scale (beyond the reference, which has no joins).
  *
  * AQE's skew-join handles most skew at runtime; `saltedJoin` is the
  * explicit fallback for the pathological case AQE can't split — one hot
  * key whose build-side rows must be replicated.
  */
object Joins {

  /** Skew-safe equi-join: salt the (big, skewed) left side's key into
    * `salt` buckets and replicate the right side once per bucket, so one
    * hot key spreads over `salt` reducers instead of one.
    *
    * Shuffle cost: left unchanged, right x salt (keep the replicated side
    * small — dims, aggregated lookups). Result equals
    * `left.join(right, keys)` exactly for inner/left joins. Right/full
    * outer would emit each unmatched RIGHT row once per salt bucket (the
    * right side is exploded), so those modes are rejected — salt the other
    * side instead. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, how: String = "inner"): DataFrame = {
    require(salt > 0)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(how.toLowerCase),
      s"saltedJoin: '$how' would duplicate unmatched right rows per salt bucket")
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLeft.join(saltedRight, keys :+ "__salt", how).drop("__salt")
  }

  /** [[saltedJoin]] with the salt factor MEASURED instead of guessed:
    * run [[graft.operators.Stats.skewReport]] on the left side's keys and
    * salt by the hot key's x_mean (clamped to [1, maxSalt]) — x_mean IS
    * the factor by which the hot reducer outweighs the average, so
    * salting by it levels the stage. When the keys are balanced
    * (x_mean ≤ 2) the plain join runs unsalted — no replication paid.
    * The diagnosis pass is one partial-merged groupBy over the left keys
    * (cheap next to the join's own shuffle, and reusable: persist the
    * report when joining the same corpus repeatedly). Result always
    * equals `left.join(right, keys, how)` for the allowed join modes. */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      how: String = "inner", maxSalt: Int = 32): DataFrame = {
    // an empty (or all-null-keyed) left side has no skew report — the
    // plain join is trivially right (and trivially empty for inner/left_semi)
    val report = graft.operators.Stats.skewReport(left, keys, topK = 1)
      .select(col("x_mean")).collect()
    if (report.isEmpty) return left.join(right, keys, how)
    val salt = math.min(maxSalt.toDouble,
      math.max(1.0, math.ceil(report(0).getDouble(0)))).toInt
    if (salt <= 2) left.join(right, keys, how)
    else saltedJoin(left, right, keys, salt, how)
  }

  /** FUZZY string equi-join — record linkage: (left, right) pairs whose
    * character-trigram Jaccard similarity is at least `threshold`.
    * Inverted-index candidate generation, never a cross join: each side
    * explodes to its distinct trigrams ([[graft.operators.TextOps
    * .charNgrams]]), only pairs sharing at least one trigram reach the
    * scorer, and exact Jaccard = inter / (size_l + size_r − inter) gates
    * the output. Trigrams shuffle as 8-byte polynomial fingerprints (the
    * engine-replayable family), not strings. Strings shorter than 3
    * chars have no trigrams and never match; null ids/strings drop.
    * Output: (lId, rId, size_l, size_r, inter, jaccard).
    *
    * `maxGramFreq` is the 100 TB skew guard (same rule as
    * Dedup.ngramJaccard): a trigram in d rows contributes d² candidate
    * pairs, so corpus-stopword trigrams ("the", "ing") dominate the join
    * — capping posting lists removes the hot trigrams from the GRAM
    * UNIVERSE: candidates, `inter`, AND the sizes all count surviving
    * trigrams only, so the reported jaccard is exact over that reduced
    * universe (stopword-filtered similarity) and internally consistent.
    * Pairs whose only shared trigrams were hot are missed; None stays
    * exact over all trigrams. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      lId: String, lStr: String, rId: String, rStr: String,
      threshold: Double, maxGramFreq: Option[Long] = None): DataFrame = {
    require(lId != rId,
      s"fuzzyJoin: id columns must have distinct names (both '$lId') — " +
        "the output carries both; rename one side first")
    def index(df: DataFrame, id: String, str: String, side: String): DataFrame =
      df.filter(col(id).isNotNull && col(str).isNotNull)
        .select(col(id).as(side), explode(TextOps.charNgrams(col(str), 3)).as("__g"))
        .select(col(side), graft.expr.TextExpressions.fingerprint(col("__g")).as("__h"))
    val li0 = index(left, lId, lStr, lId)
    val ri0 = index(right, rId, rStr, rId)
    val (li, ri) = maxGramFreq match {
      case Some(cap) => // hot set computed ONCE over both sides
        val hot = li0.select(col("__h")).unionAll(ri0.select(col("__h")))
          .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select(col("__h"))
        (li0.join(hot, Seq("__h"), "left_anti"),
          ri0.join(hot, Seq("__h"), "left_anti"))
      case None => (li0, ri0)
    }
    val sizeL = li.groupBy(col(lId)).agg(count(lit(1)).as("size_l"))
    val sizeR = ri.groupBy(col(rId)).agg(count(lit(1)).as("size_r"))
    li.join(ri, Seq("__h"))
      .groupBy(col(lId), col(rId))
      .agg(count(lit(1)).as("inter"))
      .join(sizeL, lId).join(sizeR, rId)
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("size_l") + col("size_r") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col(lId), col(rId), col("size_l"), col("size_r"),
        col("inter"), col("jaccard"))
  }

  /** Edit-distance record linkage: pairs whose strings are within
    * `maxDist` Levenshtein edits. Candidates come from the SAME
    * char-trigram inverted index as [[fuzzyJoin]] (shared-trigram
    * blocking — never a cross join); the exact `levenshtein` gate then
    * runs only on candidate pairs. By the q-gram lemma (q=3), strings
    * within d edits share at least max(len)−2−3d trigrams, so blocking
    * on ≥1 shared trigram is COMPLETE whenever max(len) ≥ 3d+3 — for
    * shorter strings (or with `maxGramFreq` capping) it is a recall
    * trade documented at the call site. Output: (lId, rId, dist). */
  def fuzzyJoinLev(left: DataFrame, right: DataFrame,
      lId: String, lStr: String, rId: String, rStr: String,
      maxDist: Int, maxGramFreq: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"fuzzyJoinLev: maxDist $maxDist")
    require(lId != rId,
      s"fuzzyJoinLev: id columns must have distinct names (both '$lId') — " +
        "the output carries both; rename one side first")
    def index(df: DataFrame, id: String, str: String): DataFrame =
      df.filter(col(id).isNotNull && col(str).isNotNull)
        .select(col(id), explode(TextOps.charNgrams(col(str), 3)).as("__g"))
        .select(col(id), graft.expr.TextExpressions.fingerprint(col("__g")).as("__h"))
    val li = index(left, lId, lStr)
    val ri = index(right, rId, rStr)
    val (lc, rc) = maxGramFreq match {
      case Some(cap) =>
        val hot = li.select(col("__h")).unionAll(ri.select(col("__h")))
          .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select(col("__h"))
        (li.join(hot, Seq("__h"), "left_anti"), ri.join(hot, Seq("__h"), "left_anti"))
      case None => (li, ri)
    }
    val cands = lc.join(rc, Seq("__h")).select(col(lId), col(rId)).distinct()
    // string columns aliased internally so lStr == rStr (both sides named
    // "name") joins without ambiguity
    cands
      .join(left.select(col(lId), col(lStr).as("__lstr")), Seq(lId))
      .join(right.select(col(rId), col(rStr).as("__rstr")), Seq(rId))
      .withColumn("dist", levenshtein(col("__lstr"), col("__rstr")))
      .filter(col("dist") <= maxDist)
      .select(col(lId), col(rId), col("dist"))
  }

  /** Time column → long microseconds (timestamps via unix_micros,
    * integral keys as-is) — shared by the range/overlap/as-of joins. */
  private def micros(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _ => c.cast(LongType)
  }

  /** Point-in-interval range join: left rows paired with the right rows
    * sharing `keys` whose [rStart, rEnd] interval (inclusive) contains
    * `lTime`. Timestamps or integer times.
    *
    * Shape — the scale-correct alternative to writing the inequality
    * predicate directly (which Spark can only plan as a broadcast nested
    * loop or a per-key cross product): the time axis is cut into
    * `bucketMicros` buckets, each interval row is exploded into every
    * bucket it overlaps, the join is a plain EQUI-join on (keys, bucket)
    * — shuffled, AQE-skew-splittable — and the exact containment filter
    * runs on the matched pairs. A left row lives in exactly one bucket,
    * so no pair is emitted twice. Pick `bucketMicros` near the median
    * interval length: cost = right-side duplication factor
    * (~ length/bucket + 1) against per-bucket pair density. Inner join
    * only (unmatched rows need an anti-join add-back; compose if needed). */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rStart: String, rEnd: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    def bucketOf(c: Column, dt: DataType): Column =
      floor(micros(c, dt) / bucketMicros).cast(LongType)
    val lb = left.withColumn("__b", bucketOf(col(lTime), left.schema(lTime).dataType))
    val rb = right.withColumn("__b", explode(sequence(
      bucketOf(col(rStart), right.schema(rStart).dataType),
      bucketOf(col(rEnd), right.schema(rEnd).dataType))))
    lb.join(rb, keys :+ "__b")
      .filter(col(lTime) >= col(rStart) && col(lTime) <= col(rEnd))
      .drop("__b")
  }

  /** Interval-OVERLAP join: pairs of intervals (per key) that intersect —
    * `a.start <= b.end AND b.start <= a.end`. Same bucketization trick as
    * [[rangeJoin]] but BOTH sides explode to their covered buckets, and a
    * pair is kept only in the FIRST bucket both cover
    * (max(bucket_start_a, bucket_start_b)) so each overlapping pair is
    * emitted exactly once — no distinct pass over the pair set. Never a
    * nested-loop plan: the equi-join on (keys, bucket) carries all
    * candidate generation; the exact overlap predicate filters locally.
    * Inner join; duplication factor ~ length/bucket + 1 per side. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    def buckets(df: DataFrame, s: String, e: String): (Column, Column) =
      (floor(micros(col(s), df.schema(s).dataType) / bucketMicros).cast(LongType),
       floor(micros(col(e), df.schema(e).dataType) / bucketMicros).cast(LongType))
    val (lb0, lb1) = buckets(left, lStart, lEnd)
    val (rb0, rb1) = buckets(right, rStart, rEnd)
    val lb = left.withColumn("__b0", lb0)
      .withColumn("__b", explode(sequence(lb0, lb1)))
    val rb = right.withColumn("__rb0", rb0)
      .withColumn("__b", explode(sequence(rb0, rb1)))
    lb.join(rb, keys :+ "__b")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") === greatest(col("__b0"), col("__rb0")))
      .drop("__b", "__b0", "__rb0")
  }

  /** As-of (point-in-time) LEFT join: for each left row, attach the right
    * row with the same `keys` whose `rightTime` is the LATEST at-or-before
    * `leftTime` (`direction = "backward"`, the default; `"forward"` takes
    * the EARLIEST at-or-after). Exact time matches count, like DuckDB
    * `ASOF LEFT JOIN ... ON l.t >= r.t` and pandas `merge_asof`. Left rows
    * with no candidate get null payload columns, as do null-keyed or
    * null-timed left rows (equality never matches SQL nulls).
    * `toleranceMicros` additionally nulls matches farther than the
    * tolerance (timestamps compare in microseconds).
    *
    * Shape — NOT a range join: both sides are union-tagged and ONE running
    * `last(payload, ignoreNulls)` window ordered by (time, side) per key
    * carries the nearest right payload onto each left row. One shuffle on
    * `keys`, one streaming O(n) frame, parallel across keys at any scale —
    * versus the inequality-join formulation, which Spark can only plan as
    * a broadcast nested loop (or a cross product per key) plus a per-pair
    * rank. The right side should be unique per (keys, time): among
    * equal-time candidates the winner is otherwise tie-broken by input
    * order, which is nondeterministic (the same ambiguity exists in
    * DuckDB's ASOF).
    *
    * Columns: output = every left column plus `right`'s non-key,
    * non-time columns (names must not collide with left's — rename before
    * joining, as with any Spark join). */
  /** [[asofJoin]] in NEAREST direction: each left row takes the right row
    * with the smallest |time gap| among the backward and forward matches
    * (per-key each is unique, so "nearest overall" = closer of the two);
    * an exact tie goes BACKWARD (pandas merge_asof's rule). Composes two
    * running-window passes — still no inequality join, two shuffles on
    * `keys` total. `toleranceMicros` bounds the gap on both sides. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val tDt = right.schema(rightTime).dataType
    def side(tag: String) = right.select(
      (keys :+ rightTime).map(col) ++
        (payload.map(c => col(c).as(s"$c$tag")) :+
          col(rightTime).as(s"__asof_t$tag")): _*)
    val bwd = asofJoin(left, side("__b"), keys, leftTime, rightTime,
      "backward", toleranceMicros)
    val both = asofJoin(bwd, side("__f"), keys, leftTime, rightTime,
      "forward", toleranceMicros)
    val (tb, tf) = (col("__asof_t__b"), col("__asof_t__f"))
    val useFwd = tf.isNotNull && (tb.isNull ||
      micros(tf, tDt) - micros(col(leftTime), left.schema(leftTime).dataType) <
        micros(col(leftTime), left.schema(leftTime).dataType) - micros(tb, tDt))
    val merged = payload.map(c =>
      when(useFwd, col(s"${c}__f")).otherwise(col(s"${c}__b")).as(c))
    both.select(left.columns.map(col).toIndexedSeq ++ merged: _*)
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin: at least one equality key")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"asofJoin: right payload columns collide with left: $collide")
    val backward = direction match {
      case "backward" => true
      case "forward"  => false
      case other => throw new IllegalArgumentException(
        s"asofJoin: direction must be backward|forward, got '$other'")
    }
    // union-tag: right rows carry their payload in one struct; left rows
    // carry their full row in another. Null-keyed / null-timed RIGHT rows
    // can never match and are dropped up front.
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(col(rightTime).as("__rt") +: payload.map(col).toIndexedSeq: _*)
    val rUp = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTime).isNotNull)
      .select(keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        rStruct.as("__r")): _*)
    val lUp = left.select(keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rUp.schema("__r").dataType).as("__r"), lStruct.as("__l")): _*)
    val unioned = rUp.withColumn("__l", lit(null).cast(lUp.schema("__l").dataType))
      .unionByName(lUp)
    // time order: backward scans ascending (latest right at-or-before wins),
    // forward scans descending (earliest right at-or-after wins). Right
    // (side 0) sorts before left at EQUAL times -> exact matches included;
    // null left times sort first so no right row precedes them.
    val ord =
      if (backward) Seq(col("__t").asc_nulls_first, col("__side").asc)
      else Seq(col("__t").desc_nulls_first, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val tDt = lUp.schema("__t").dataType
    val inTol = toleranceMicros match {
      case None => lit(true)
      case Some(tol) =>
        val gap =
          if (backward) micros(col("__t"), tDt) - micros(col("__m").getField("__rt"), tDt)
          else micros(col("__m").getField("__rt"), tDt) - micros(col("__t"), tDt)
        gap <= tol
    }
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val payloadCols = payload.map(c =>
      when(col("__m").isNotNull && inTol, col("__m").getField(c)).as(c))
    unioned
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq ++ payloadCols: _*)
  }
}
