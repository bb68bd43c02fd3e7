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

  /** Aggregate view of [[snapshotDiff]]: (change, n) — the one-line
    * health answer ("release 14 → 15: +1.2M added, 40k changed"). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      idCols: Seq[String], compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, idCols, compareCols)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
