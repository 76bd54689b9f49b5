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

  /** Delete every staged dir and forget it, so the next face re-stages
    * inside its own timed window — cold-rerun uniformity, see
    * [[graft.WarmState]]. */
  def reset(): Unit = {
    dirs.keys.foreach(k => dirs.remove(k).foreach(WarmDirs.deleteRecursively))
  }
}

/** Recursive temp-dir delete shared by the staging resets. Refuses paths
  * whose basename lacks the `graft_` temp prefix — every staged dir is
  * created via `createTempDirectory("graft_…")`, so the guard turns a
  * bookkeeping bug into a no-op instead of an arbitrary-path delete.
  */
private[graft] object WarmDirs {
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (!p.getFileName.toString.startsWith("graft_")) return
    if (!java.nio.file.Files.exists(p)) return
    val st = java.nio.file.Files.walk(p)
    // best-effort: a vanished file mid-walk surfaces as IOException from
    // deleteIfExists OR UncheckedIOException from the walk iterator itself
    try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    catch {
      case _: java.io.IOException => ()
      case _: java.io.UncheckedIOException => ()
    }
    finally st.close()
  }
}
