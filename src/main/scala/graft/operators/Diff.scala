package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison for dataset versioning — the audit between two
  * releases of a corpus: which rows were added, removed, or changed.
  * Training-data governance runs this before every retrain ("what moved
  * since the data the deployed model saw?") and after every pipeline
  * change ("did the refactor alter anything it shouldn't have?").
  */
object Diff {

  /** Row-level diff of two snapshots keyed by `idCols`: one output row
    * per id present in EITHER side, with `change` ∈ added | removed |
    * changed | unchanged (null-safe comparison over `compareCols`, so
    * null → value and value → null count as changes and null == null
    * does not). Old-side values keep their names; new-side compare
    * columns arrive suffixed `_new` (id-only diffs pass compareCols =
    * Nil and get pure membership).
    *
    * Scale shape: ONE full-outer sort-merge join on the id — each side
    * shuffles once on unique keys (no skew by construction), the change
    * tag is a narrow null-safe projection, and filters on `change`
    * (`!= 'unchanged'`, typically selecting a tiny fraction) sit
    * directly above the join for early pruning. At 100 TB prefer both
    * snapshots bucketed on the id (TableIO.writeBucketed) — the join
    * then needs no exchange at all. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "snapshotDiff: need at least one id column")
    val o = oldDf.select((idCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(1))
    val n = compareCols.foldLeft(
        newDf.select((idCols ++ compareCols).map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, c + "_new")
      }
      .withColumn("__in_new", lit(1))
    val changedPred =
      if (compareCols.isEmpty) lit(false)
      else compareCols.map(c => !(col(c) <=> col(c + "_new"))).reduce(_ || _)
    o.join(n, idCols, "full_outer")
      .withColumn("change",
        when(col("__in_new").isNull, lit("removed"))
          .when(col("__in_old").isNull, lit("added"))
          .when(changedPred, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
  }

  /** CDC MERGE — materialize the next snapshot from the previous one
    * plus a change set in [[snapshotDiff]] output shape (added / changed
    * rows carry their values in the `_new`-suffixed columns; `unchanged`
    * rows, if present, are ignored). Upsert-and-delete in one pass:
    * survivors = old rows whose id is not deleted/replaced (LEFT ANTI on
    * the dead-id set), plus the added/changed rows' new values.
    *
    * Contract (spec'd): `applyChanges(old, snapshotDiff(old, new))`
    * equals `new` row-for-row — the diff is a faithful change capture
    * and this is its faithful application, so ship-the-diff beats
    * ship-the-snapshot whenever churn is a small fraction of the corpus.
    *
    * Scale shape: the change set is the churn (typically ≪ corpus), so
    * the anti join broadcasts under AQE; the union is narrow. At 100 TB
    * with both sides bucketed on the id this is the nightly-merge plan:
    * no full-corpus shuffle, cost proportional to churn + one scan. */
  def applyChanges(oldDf: DataFrame, changes: DataFrame,
      idCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "applyChanges: need at least one id column")
    val upserts = changes.filter(col("change").isin("added", "changed"))
      .select(idCols.map(col) ++ valueCols.map(c => col(c + "_new").as(c)): _*)
    val dead = changes.filter(col("change").isin("removed", "changed"))
      .select(idCols.map(col): _*)
    oldDf.select((idCols ++ valueCols).map(col): _*)
      .join(dead, idCols, "left_anti")
      .unionByName(upserts)
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view face of
    * CDC: given a standing grouped aggregate (`keyCols`,
    * `<measure>_sum` DECIMAL columns, row count `n`) and a
    * [[snapshotDiff]] change set, produce the aggregate OVER THE NEW
    * RELEASE without rescanning it: removed/changed rows retract their
    * OLD contributions (negated), added/changed rows add their NEW ones,
    * the delta (churn-sized) merges into the standing aggregate with one
    * full-outer join, and groups whose count reaches zero vanish —
    * exactly as a from-scratch GROUP BY would omit them.
    *
    * Contract (spec'd + oracle-gated): maintained ≡ recomputed, row for
    * row — which REQUIRES decimal measures: decimal addition is
    * associative-commutative, so retract-then-add lands on the identical
    * sum a fresh scan produces; double sums would drift and the view
    * could never be audited against a recompute again.
    *
    * Scale shape: cost is O(churn) + O(|groups|) — the nightly rollup
    * refresh touches the changes and the (small) aggregate, never the
    * 100 TB fact history. Grouping keys may themselves change between
    * releases (a re-labeled doc moves between groups): old keys come
    * from the change row's old-side columns, new keys from `_new`. */
  def maintainAgg(oldAgg: DataFrame, changes: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String],
      // The measure carrier. (38,4) suits money-like measures; callers
      // whose measures are already exact integers at full precision
      // (momentsMaintain's DECIMAL(38,0) power sums, where a per-row
      // x^4 can reach 1e37) pass scale 0 — a (38,4) cast would silently
      // null values >= 1e34 under non-ANSI Spark and sum() would skip
      // them, breaking the maintained == recomputed contract.
      dec: org.apache.spark.sql.types.DecimalType =
        org.apache.spark.sql.types.DecimalType(38, 4)): DataFrame = {
    require(keyCols.nonEmpty, "maintainAgg: need at least one grouping key")
    // ONE pass over the change set: each change row explodes into its
    // retract and/or add contribution. (A union of two filtered
    // branches would recompute the upstream diff join twice — measured
    // as doubled exchanges on q_moments_maintain's plan.)
    // retraction negates via 0 - x, NOT unary minus: Spark's UnaryMinus
    // on decimals rounds through MathContext.DECIMAL128 (34 significant
    // digits), silently clipping the low digits of a near-38-digit sum;
    // Subtract stays exact at full precision
    val negStruct = struct(keyCols.map(col) ++
      measureCols.map(c =>
        (lit(0).cast(dec) - col(c).cast(dec)).as(s"${c}_sum")) :+
      lit(-1L).as("n"): _*)
    val posStruct = struct(keyCols.map(c => col(c + "_new").as(c)) ++
      measureCols.map(c => col(c + "_new").cast(dec).as(s"${c}_sum")) :+
      lit(1L).as("n"): _*)
    val delta = changes.select(explode(array(
        when(col("change").isin("removed", "changed"), negStruct),
        when(col("change").isin("added", "changed"), posStruct))).as("__c"))
      .filter(col("__c").isNotNull)
      .select(col("__c.*"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(s"${measureCols.head}_sum")).as(s"${measureCols.head}_sum"),
        (measureCols.tail.map(c => sum(col(s"${c}_sum")).as(s"${c}_sum")) :+
          sum(col("n")).as("n")): _*)
    // NULL-SAFE key join: groupBy puts null keys in a real group, and a
    // plain equi-join would never match it across the merge (two
    // disjoint null-group rows instead of one maintained group).
    // Explicit aliases: oldAgg and delta often share lineage (both built
    // off the same release frames), which would otherwise trip Spark's
    // ambiguous-self-join detection.
    val o = oldAgg.alias("__mv_old")
    val d = delta.alias("__mv_delta")
    val joinCond = keyCols
      .map(k => col(s"__mv_old.$k") <=> col(s"__mv_delta.$k")).reduce(_ && _)
    val merged = o.join(d, joinCond, "full_outer")
      .select(keyCols.map(k =>
          coalesce(col(s"__mv_old.$k"), col(s"__mv_delta.$k")).as(k)) ++
        measureCols.map { c =>
          (coalesce(col(s"__mv_old.${c}_sum"), lit(0).cast(dec)) +
            coalesce(col(s"__mv_delta.${c}_sum"), lit(0).cast(dec))).as(s"${c}_sum")
        } :+
        (coalesce(col("__mv_old.n"), lit(0L)) +
          coalesce(col("__mv_delta.n"), lit(0L))).as("n"): _*)
    merged.filter(col("n") > 0)
  }

  // ---- SCD Type 2: validity-interval history ----

  /** Seed an SCD-2 history from a release: every row open
    * (`valid_from` = version, `valid_to` = null). */
  def scd2Init(release: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      version: Int): DataFrame =
    release.select((idCols ++ valueCols).map(col): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("int"))

  /** SCD TYPE 2 — the history face of CDC (the third of the triple:
    * [[applyChanges]] materializes the current snapshot, [[maintainAgg]]
    * the rollups, this the full lineage): instead of overwriting, each
    * release CLOSES the open interval of every changed/removed id
    * (`valid_to` = version) and OPENS a new row for every added/changed
    * id — "what did this record look like when the model trained?" is a
    * filter, not an archaeology project.
    *
    * Scale shape: the dead-id set is churn-sized (AQE broadcasts it into
    * the left join that closes intervals); opened rows are churn-sized;
    * closed history is carried through untouched — cost O(history +
    * churn), no full-corpus shuffle with bucketed ids.
    *
    * Time travel: [[scd2Current]] (open rows) reproduces
    * `applyChanges`'s snapshot; [[scd2AsOf]] reproduces ANY prior
    * release (both spec'd as exact equalities). */
  def applyChangesScd2(history: DataFrame, changes: DataFrame, idCols: Seq[String],
      valueCols: Seq[String], version: Int): DataFrame = {
    require(idCols.nonEmpty, "applyChangesScd2: need at least one id column")
    val dead = changes.filter(col("change").isin("removed", "changed"))
      .select(idCols.map(col): _*).withColumn("__dead", lit(1))
    val closed = history.join(dead, idCols, "left")
      .withColumn("valid_to",
        when(col("__dead").isNotNull && col("valid_to").isNull, lit(version))
          .otherwise(col("valid_to")))
      .drop("__dead")
    val opened = changes.filter(col("change").isin("added", "changed"))
      .select(idCols.map(col) ++ valueCols.map(c => col(c + "_new").as(c)): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("int"))
    closed.unionByName(opened)
  }

  /** The current snapshot: open intervals only. */
  def scd2Current(history: DataFrame): DataFrame =
    history.filter(col("valid_to").isNull).drop("valid_from", "valid_to")

  /** Time travel: the snapshot as of `version` (rows whose interval
    * covers it). */
  def scd2AsOf(history: DataFrame, version: Int): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")

  /** As-of ENRICHMENT against an SCD-2 history: each fact row joins the
    * dimension version in effect at the fact's OWN version column —
    * "train on the metadata the doc had when the event happened", the
    * point-in-time join that makes SCD-2 histories useful rather than
    * archival. Facts with no covering interval (id not yet added, or
    * already removed at that version) keep null dimension values.
    *
    * Scale shape: an equi hash join on the id columns — the interval
    * predicate rides along as the join's residual condition, NOT a
    * range-join blowup, because intervals per id are few (churn count)
    * and disjoint, so each fact matches at most one history row. At
    * 100 TB this is the same plan as any fact→dim enrichment: shuffle
    * (or bucket-colocate) on id, nothing else.
    *
    * Dimension value column names must not collide with fact column
    * names (rename on the way in if they do). */
  def scd2EnrichAsOf(facts: DataFrame, history: DataFrame,
      idCols: Seq[String], versionCol: String): DataFrame = {
    require(idCols.nonEmpty, "scd2EnrichAsOf: need at least one id column")
    val f = facts.alias("__fact")
    val h = history.alias("__dim")
    val cond = idCols.map(k => col(s"__fact.$k") === col(s"__dim.$k"))
      .reduce(_ && _) &&
      col("__dim.valid_from") <= col(s"__fact.$versionCol") &&
      (col("__dim.valid_to").isNull ||
        col("__dim.valid_to") > col(s"__fact.$versionCol"))
    val dimVals = history.columns
      .filterNot(c => idCols.contains(c) || c == "valid_from" || c == "valid_to")
    f.join(h, cond, "left")
      .select(facts.columns.map(c => col(s"__fact.$c")) ++
        dimVals.map(c => col(s"__dim.$c")): _*)
  }

  /** Aggregate view of [[snapshotDiff]]: (change, n) — the one-line
    * health answer ("release 14 → 15: +1.2M added, 40k changed"). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCols: Seq[String], compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, idCols, compareCols)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
