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
