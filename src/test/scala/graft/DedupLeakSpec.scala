package graft

import graft.operators.Dedup

/** Round-4 VERDICT item 6: the pair pipelines used to discard their
  * checkpoint RDD ids, so every invocation pinned a fresh generation of
  * blocks for the life of the session (Bench/Verify sweep between queries,
  * but a plain library caller does not). A repeat invocation now supersedes
  * the previous call's blocks — double invocation must leave the session's
  * persistent-RDD count flat.
  */
class DedupLeakSpec extends SparkSpecBase {

  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size

  private def assertFlat(name: String)(run: => Long): Unit = {
    val r1 = run
    val afterFirst = pinned
    val r2 = run
    assert(r2 == r1, s"$name: repeat invocation changed the result count")
    // the leak contract is NO GROWTH; strictly fewer is fine — the session's
    // 30s periodic GC (ContextCleaner) may reclaim the first invocation's
    // now-unreachable blocks between the two samples in a long suite run
    assert(pinned <= afterFirst,
      s"$name: second invocation grew pinned RDDs $afterFirst -> $pinned")
  }

  test("minhashLshPairs double invocation keeps pinned-RDD count flat") {
    assertFlat("minhashLshPairs")(Dedup.minhashLshPairs(spark, Sf).count())
  }

  test("ngramJaccardPairs double invocation keeps pinned-RDD count flat") {
    assertFlat("ngramJaccardPairs")(Dedup.ngramJaccardPairs(spark, Sf).count())
  }

  test("simhashPairs double invocation keeps pinned-RDD count flat") {
    assertFlat("simhashPairs")(Dedup.simhashPairs(spark, Sf).count())
  }

  test("clusterLabels double invocation keeps pinned-RDD count flat") {
    assertFlat("dedupClusters") {
      Dedup.dedupClusters(spark, Sf, Dedup.minhashLshPairs(spark, Sf)).count()
    }
  }

  test("pageRank double invocation keeps pinned-RDD count flat") {
    assertFlat("pageRank")(graft.operators.Graphs.pageRank(spark, Sf).count())
  }

  test("triangleCount double invocation keeps pinned-RDD count flat") {
    assertFlat("triangleCount")(
      graft.operators.Graphs.triangleCount(spark, Sf).head().getLong(0))
  }
}
