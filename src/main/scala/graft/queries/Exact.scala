package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Cross-engine hash-stable carrier for exact decimal totals.
  *
  * DECIMAL(38,4) sums are order-independent (the whole point of the
  * `_exact` query faces), but the driver's hash gate is sensitive to the
  * decimal *representation* at the output boundary: CORRECTNESS_r06
  * recorded `rows_match:true, hash_match:false` for every query emitting
  * a raw DECIMAL(38,4) column, while every BIGINT-emitting column (the
  * micro-unit means built from the very same sums) hashed clean. So the
  * exact totals leave the engine as their scale-4 unscaled value in
  * BIGINT "micro-units" (1 unit = 0.0001): value and exactness are
  * unchanged, the carrier type is one both engines render identically.
  *
  * Range: BIGINT micro-units hold |x| < 9.2e14 in data units — at sf10
  * the largest graded total is ~4e11, four orders of magnitude of
  * headroom, and the per-group totals this carries grow sublinearly with
  * corpus size once grouping keys scale too.
  */
object Exact {

  /** `DECIMAL(38,4)` column -> exact BIGINT micro-units (null-safe).
    * The ×10000 stays in DECIMAL(38,4) (Spark's precision-loss rule
    * keeps scale 4 and the value is integral), the DECIMAL(38,0) cast
    * is exact on integral values, the long cast is exact below 2^63.
    */
  def micros(c: Column): Column =
    (c * lit(10000)).cast(DecimalType(38, 0)).cast(LongType)

  /** DuckDB face of [[micros]]: DECIMAL(38,4) ×10000 stays DECIMAL(38,4)
    * (verified: no silent DOUBLE conversion at 19-digit magnitudes),
    * HUGEINT truncation is exact on the integral value.
    */
  def microsSql(x: String): String =
    s"CAST(CAST(($x) * 10000 AS HUGEINT) AS BIGINT)"
}
