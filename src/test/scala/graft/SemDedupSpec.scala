package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup (pinned-centroid semantic dedup): keep-rule, greedy
  * upper-triangular drop semantics, planted-copy behavior, grid
  * invariance. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val c0 = Array(1f, 0f)
  private val c1 = Array(0f, 1f)

  private def run(pts: Seq[(Long, Array[Float])], tau: Double, grid: Int = 4) =
    Similarity.semDedupPinned(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", Array(c0, c1), tau, grid)
      .select("vec_id").as[Long].collect().toSet

  test("keeps the representative FARTHEST from the centroid") {
    // cells: {1, 2} -> c0, {3, 4} -> c1; each pair is within tau=0.95.
    // csim(2) < csim(1) and csim(4) < csim(3), so 2 and 4 are kept.
    val kept = run(Seq(
      1L -> Array(1f, 0f), 2L -> Array(0.9f, 0.1f),
      3L -> Array(0f, 1f), 4L -> Array(0.1f, 0.9f)), tau = 0.95)
    assert(kept == Set(2L, 4L))
  }

  test("greedy triu rule: a DROPPED row still eliminates later rows") {
    // angles from c0: x=40deg, y=20deg, z=0deg; rank asc csim = x, y, z.
    // tau=0.9: cos(x,y)=cos20>0.9 drops y; cos(y,z)=cos20>0.9 drops z even
    // though y itself dropped (cos(x,z)=cos40<0.9). Survivor: x only.
    def at(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val kept = run(Seq(10L -> at(40), 20L -> at(20), 30L -> at(0)), tau = 0.9)
    assert(kept == Set(10L))
  }

  test("identical-copy tie breaks by id: original kept, copy dropped") {
    val kept = run(Seq(1L -> Array(0.6f, 0.8f), 2L -> Array(0.6f, 0.8f)), tau = 0.99)
    assert(kept == Set(1L))
  }

  test("rows below tau everywhere all survive, with cell + centroid_sim attached") {
    val out = Similarity.semDedupPinned(
      Seq(1L -> Array(1f, 0f), 2L -> Array(0f, 1f)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", Array(c0, c1), tau = 0.99)
    val rows = out.orderBy("vec_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("cell") == 0 && rows(1).getAs[Int]("cell") == 1)
    assert(math.abs(rows(0).getAs[Double]("centroid_sim") - 1.0) < 1e-6)
  }

  test("survivor set is invariant to the grid decomposition") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 60L).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat)
      i -> v
    }
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f))
    def go(grid: Int) = Similarity.semDedupPinned(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, tau = 0.6, grid)
      .select("vec_id").as[Long].collect().toSet
    assert(go(1) == go(4) && go(4) == go(7))
  }
}
