package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: round-by-round diagnostics for connectedComponentsStar. */
object StarDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = args.headOption.map(_.toInt).getOrElse(40)
    val perm = rnd.shuffle((0L until n.toLong).toVector)
    val path = (0 until n - 1).map(i => (perm(i), perm(i + 1))).toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.connectedComponentsStar(path, "id_a", "id_b")
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"[stardebug] n=$n nodes=${m.size} roots=${m.values.toSet.size} " +
      f"took=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val hm = graft.operators.Dedup.connectedComponents(path, "id_a", "id_b",
      smallGraphLimit = 0L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"[stardebug] equal_hashmin=${m == hm}")
    spark.stop()
  }
}
// timing harness for the hash-min distributed path alone
object HashMinDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val perm = rnd.shuffle((0L until n.toLong).toVector)
    val path = (0 until n - 1).map(i => (perm(i), perm(i + 1))).toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val hm = graft.operators.Dedup.connectedComponents(path, "id_a", "id_b",
      smallGraphLimit = 0L).collect()
    println(f"[hashmin] n=$n rows=${hm.length} took=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
