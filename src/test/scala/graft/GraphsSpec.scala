package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Graph operators: PageRank hand-model and invariants, label
  * propagation semantics. */
class GraphsSpec extends SparkSpec {

  test("pageRank: one iteration matches the hand model, mass sums to 1") {
    import spark.implicits._
    // A->B, A->C, B->C; C dangling. N=3, p0 = 1/3.
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("src", "dst")
    val pr1 = Graphs.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val const = 0.15 / 3 + 0.85 * (1.0 / 3) / 3 // teleport + dangling C
    assert(math.abs(pr1("A") - const) < 1e-12)
    assert(math.abs(pr1("B") - (const + 0.85 / 6)) < 1e-12)           // A/2
    assert(math.abs(pr1("C") - (const + 0.85 * (1.0 / 6 + 1.0 / 3))) < 1e-12)
    assert(math.abs(pr1.values.sum - 1.0) < 1e-9)
    // more iterations keep total mass 1 and the sink ranked highest
    val pr3 = Graphs.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr3.values.sum - 1.0) < 1e-9)
    assert(pr3("C") > pr3("B") && pr3("B") > pr3("A"))
    // parallel edges collapse: duplicating the edge list changes nothing
    val dup = Graphs.pageRank(edges.union(edges), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dup == pr3)
  }

  test("hits: hand-computed integer path counts; dup/self-loop/degree-0 edges") {
    import spark.implicits._
    // a->b, a->c, b->c, c->a: auth1 = in-degree; hub1(a)=3, (b)=2, (c)=1;
    // auth2(a)=1, (b)=3, (c)=5; hub2(a)=8, (b)=5, (c)=1
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val got = Graphs.hits(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("a" -> ((8L, 1L)), "b" -> ((5L, 3L)), "c" -> ((1L, 5L))))
    // duplicate edges collapse; self-loops count like any edge; a node
    // with no in-edges is a pure hub (auth 0), no out-edges pure authority
    val e2 = Seq(("x", "y"), ("x", "y"), ("y", "y"), ("z", "y"))
      .toDF("src", "dst")
    val g2 = Graphs.hits(e2, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g2 === Map("x" -> ((9L, 0L)), "y" -> ((9L, 9L)), "z" -> ((9L, 0L))))
    // one iteration: auth = in-degree exactly
    val g1 = Graphs.hits(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g1 === Map("a" -> 1L, "b" -> 1L, "c" -> 2L))
  }

  test("propagateLabels: majority wins, tie to smallest, seeds keep, isolated null") {
    import spark.implicits._
    val nodes = Seq(
      (1L, Some("en")), (2L, Some("en")), (3L, Some("de")),
      (10L, None), // neighbors 1,2,3 -> en 2:1
      (11L, None), // neighbors 2,3 -> tie -> "de" (smallest)
      (12L, None), // neighbor 13 unlabeled -> stays null
      (13L, None)).toDF("id", "label")
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 2L), (11L, 3L), (12L, 13L)).toDF("a", "b")
    val out = Graphs.propagateLabels(nodes, "id", "label", pairs, "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).orNull,
        Option(r.getString(3)).orNull)).toSeq
    assert(out == Seq(
      (1L, "en", "seed"), (2L, "en", "seed"), (3L, "de", "seed"),
      (10L, "en", "propagated"), (11L, "de", "propagated"),
      (12L, null, null), (13L, null, null)))
  }
}
