package graft.sources

import org.apache.spark.sql.SparkSession

/** Stage-once memo for faces that materialize a fixture layout (a landing,
  * a partitioned table, an evolved-schema pair) per (session, dataset):
  * one temp directory per distinct `name`, built exactly once per key and
  * reused by every later call — the amortized-write contract every layout
  * face's bench timing note relies on. The dir is deleteOnExit-registered
  * BEFORE `build` runs so a failed build never leaks it. `build` receives
  * the dir path and may lay out any substructure (pair faces create two
  * subdirs under the one root).
  *
  * Same non-atomicity caveat as every TrieMap memo in the repo: two
  * threads racing the first call may both build; last write wins and both
  * results are valid — the builds are deterministic functions of
  * (dataset, name).
  */
private[graft] object StagedDirs {
  private val dirs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]

  def once(s: SparkSession, d: String, name: String)(build: String => Unit): String =
    dirs.getOrElseUpdate((s, d, name), {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$name")
      dir.toFile.deleteOnExit()
      build(dir.toString)
      dir.toString
    })
}
