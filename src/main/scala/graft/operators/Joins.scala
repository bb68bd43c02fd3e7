package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
