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

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 -> uniform in [-0.5, 0.5). Same plane on any executor. */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast(DoubleType) / lit(Long.MaxValue.toDouble) / 2.0)

  /** Random-hyperplane LSH signature: `planes` sign bits packed in a Long.
    * P(bit match) = 1 - angle/pi — standard SimHash-for-cosine. */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    require(planes <= 63, "signature packs into one Long")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus into
    * cells; each query probes only the `nProbe` nearest cells, exact
    * cosine re-ranks the candidates. The classic quantization scale path:
    * corpus assignment is one narrow pass after a (sample-based) fit, and
    * query cost drops by ~nCells/nProbe vs brute force. Recall rises with
    * nProbe (nProbe = nCells is exact). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // few iterations suffice: cells only need to be roughly balanced, and
    // recall comes from nProbe, not centroid quality
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    // centroid table is tiny: broadcast-join both sides against it
    import spark.implicits._
    val cdf = centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "cv")
    def assign(df: DataFrame, id: String, top: Int): DataFrame = {
      val scored = df.select(col(idCol).as(id), col(vecCol).as(id + "_v"))
        .crossJoin(broadcast(cdf))
        .withColumn("sim", cosine(col(id + "_v"), col("cv")))
      val w = Window.partitionBy(col(id)).orderBy(col("sim").desc, col("cell"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= top)
        .select(col(id), col(id + "_v"), col("cell"))
    }
    val c = assign(corpus, "neighbor_id", 1)          // corpus: nearest cell only
    val q = assign(queries, "query_id", nProbe)       // queries: probe nProbe cells
    val cands = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("query_id_v").as("qv"), col("neighbor_id_v").as("cv"))
      .distinct()
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
      vecCol: String, k: Int, planes: Int = 16): DataFrame = {
    require(planes % 4 == 0)
    val r = planes / 4
    def banded(df: DataFrame, id: String): DataFrame = {
      val sig = hyperplaneSignature(col(vecCol), planes)
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
      .distinct()
    val scored = cands.withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
