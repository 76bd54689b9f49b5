package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Pins [[Graphs.triangleCountEdges]] on handcrafted graphs and checks the
  * degree-ordered node-iterator against a naive triple join (a different
  * algorithm) on the real co-order graph.
  */
class GraphsSpec extends SparkSpecBase {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Graphs.triangleCountEdges(edges.toDF("u", "v")).head().getLong(0)

  test("handcrafted graphs: K4 has 4 triangles, a path none, pendant adds none") {
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) == 4L)
    // path 1-2-3-4: wedges but no closures
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    // triangle {1,2,3} + pendant 4: exactly one
    assert(count(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) == 1L)
  }

  test("fixed-point pageRank: hand-computed ranks on the path graph 1-2-3") {
    val S = Graphs.RankScale
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    def ranks(iters: Int): Map[Long, Long] =
      Graphs.pageRankEdges(edges, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter 1: node 2 receives S/1 from each end; nodes 1,3 receive S/2
    val base = S * 15L / 100L
    val r1 = Map(
      1L -> (base + 17L * (S / 2) / 20L),
      2L -> (base + 17L * (S + S) / 20L),
      3L -> (base + 17L * (S / 2) / 20L))
    assert(ranks(1) == r1)
    // iter 2: recompute from r1 with the same integer formula
    val r2mid = base + 17L * (r1(1L) + r1(3L)) / 20L
    val r2end = base + 17L * (r1(2L) / 2) / 20L
    assert(ranks(2) == Map(1L -> r2end, 2L -> r2mid, 3L -> r2end))
  }

  test("degree-ordered count equals the naive triple join on the co-order graph") {
    val edges = Graphs.coOrderEdges(spark, Sf).cache()
    try {
      val fast = Graphs.triangleCountEdges(edges).head().getLong(0)
      val e1 = edges.select(col("u").as("a"), col("v").as("b"))
      val e2 = edges.select(col("u").as("b"), col("v").as("c"))
      val e3 = edges.select(col("u").as("a"), col("v").as("c"))
      val naive = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
      assert(fast == naive && fast > 0L)
    } finally edges.unpersist()
  }
}
