package graft

import graft.operators.ThreadGraph
import graft.sources.JsonLanding

/** Pointer-doubling thread resolution: chains, forests, dangling parents,
  * and the real comments fixture.
  */
class ThreadGraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("resolves a 10-deep chain in log-rounds and counts exact depths") {
    // chain 1 <- 2 <- ... <- 10, plus a separate root 100 with child 101
    val chain = (2L to 10L).map(i => (i, Some(i - 1))) ++
      Seq((1L, None), (100L, None), (101L, Some(100L)))
    val df = chain.toDF("id", "parent")
    val out = ThreadGraph.threadIndex(df, maxDepth = 16)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1L to 10L).foreach { i =>
      assert(out(i) == ((1L, i - 1, true)), s"node $i")
    }
    assert(out(100L) == ((100L, 0L, true)))
    assert(out(101L) == ((100L, 1L, true)))
  }

  test("dangling parents come back unresolved") {
    val df = Seq((1L, Option.empty[Long]), (2L, Some(999L))).toDF("id", "parent")
    val out = ThreadGraph.threadIndex(df)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((999L, false)))
  }

  test("chains deeper than maxDepth are flagged, shallower fully resolve") {
    val chain = (2L to 40L).map(i => (i, Some(i - 1))) :+ ((1L, Option.empty[Long]))
    val df = chain.toDF("id", "parent")
    val out = ThreadGraph.threadIndex(df, maxDepth = 8)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // maxDepth 8 → 3 rounds → pointers advance up to 2^3 = 8 hops
    assert(out(8L) == ((1L, 7L, true)))
    assert(!out(40L)._3, "39-deep node cannot resolve in 3 rounds")
  }

  test("threads the comments fixture (root + reply)") {
    val comments = JsonLanding.readComments(spark,
      fixture("/fixtures/comments/2022-01-02_1.json"))
    val out = ThreadGraph.threadIndex(comments)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(101L) == ((101L, 0L, true)))
    assert(out(102L) == ((101L, 1L, true)))
  }
}
