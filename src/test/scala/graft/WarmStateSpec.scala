package graft

import graft.operators.Similarity

/** Pins the two claims [[WarmState.resetForColdRerun]] rests on (r14 verdict
  * task 5): a reset actually FORGETS staged state (so a rerun re-stages
  * inside its own timed window), and every reset memo is re-derivable —
  * re-training after a reset produces the bit-identical model, so cold-reset
  * changes cost accounting, never results.
  */
class WarmStateSpec extends SparkSpecBase {

  test("StagedDirs.reset deletes the staged dir and forces a re-stage") {
    var builds = 0
    val d1 = graft.sources.StagedDirs.once(spark, Sf, "warmstate_spec") { dir =>
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "probe.txt"), "x")
      ()
    }
    // memoized: a second call must NOT rebuild
    val d1b = graft.sources.StagedDirs.once(spark, Sf, "warmstate_spec")(_ => builds += 1)
    assert(d1b === d1 && builds === 1)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1, "probe.txt")))
    WarmState.resetForColdRerun()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      "reset must delete the staged dir, not just forget it")
    val d2 = graft.sources.StagedDirs.once(spark, Sf, "warmstate_spec")(_ => builds += 1)
    assert(builds === 2 && d2 != d1, "post-reset call must re-stage fresh")
    WarmState.resetForColdRerun() // leave no spec litter behind
  }

  test("reset model memos: re-training is bit-identical (results never change)") {
    val c1 = Similarity.trainedCentroids(spark, Sf)
    // memo: same call returns the SAME instance
    assert(Similarity.trainedCentroids(spark, Sf) eq c1)
    WarmState.resetForColdRerun()
    val c2 = Similarity.trainedCentroids(spark, Sf)
    assert(!(c2 eq c1), "reset must actually drop the memo (cost re-paid)")
    // order-deterministic training: every double identical — the property
    // that makes cold-reset safe for oracle-parity faces
    assert(c1.length === c2.length)
    c1.indices.foreach { i =>
      assert(java.util.Arrays.equals(c1(i), c2(i)),
        s"centroid $i differs after re-training — cold-reset would change results")
    }
  }

  test("WarmDirs refuses paths without the graft_ temp prefix") {
    val dir = java.nio.file.Files.createTempDirectory("keepme_spec")
    try {
      graft.sources.WarmDirs.deleteRecursively(dir.toString)
      assert(java.nio.file.Files.exists(dir),
        "guard must refuse non-graft_ paths outright")
    } finally java.nio.file.Files.deleteIfExists(dir)
  }
}
