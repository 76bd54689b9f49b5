package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage truncation for iterative dataflows (label propagation, pointer
  * doubling): each round's state must be `localCheckpoint`ed — otherwise
  * round k's plan embeds two copies of round k−1's and the base work
  * re-executes ~2^rounds times — and each *superseded* round's blocks must
  * actually be released.
  *
  * The release is the subtle part: `Dataset.unpersist()` on a checkpointed
  * frame is a NO-OP — it routes through `CacheManager.uncacheQuery`, which
  * never registered the checkpoint's RDD, so a long iteration silently pins
  * rounds × |state| blocks for the rest of the session. The working lever is
  * the underlying RDD id: diff `sparkContext.getPersistentRDDs` around the
  * eager checkpoint, and unpersist the superseded ids once the next round's
  * checkpoint exists.
  */
private[graft] object IterCheckpoint {

  /** Eagerly localCheckpoints `df`; returns the truncated frame plus the ids
    * of the RDDs the checkpoint registered (to pass to [[free]] when this
    * round is superseded).
    *
    * The before/diff window is serialized on a JVM-wide lock (r20 ADVICE):
    * two frames checkpointed concurrently on one SparkContext would
    * cross-attribute each other's RDD ids, and a later supersede would then
    * unpersist another pipeline's LIVE localCheckpoint blocks — an
    * unrecoverable "checkpoint block not found", since truncated lineage
    * cannot recompute. Bench/Verify drive faces serially today, so the lock
    * is uncontended there; it turns the latent concurrent-construction
    * hazard into a correct (serialized) execution instead of a corruption.
    */
  private val attributionLock = new Object
  def checkpoint(df: DataFrame): (DataFrame, Set[Int]) =
    attributionLock.synchronized {
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val ck = df.localCheckpoint()
      (ck, sc.getPersistentRDDs.keySet.diff(before).toSet)
    }

  /** Release a superseded round's checkpoint blocks (non-blocking). */
  def free(s: SparkSession, ids: Set[Int]): Unit =
    ids.foreach(id => s.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

  /** Library-caller leak guard for one-shot (non-round-based) checkpoints:
    * registering a NEW invocation's ids under the same (session, key) frees
    * the previous invocation's blocks, so at most one generation stays
    * pinned per pipeline. Contract: re-invoking a pipeline invalidates the
    * frame a previous call returned ([[graft.operators.Dedup]] established
    * the pattern; Bench/Verify additionally sweep `getPersistentRDDs`).
    */
  private val live =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Set[Int]]
  def supersede(s: SparkSession, key: String, ids: Set[Int]): Unit = {
    // drop entries whose session is gone — otherwise the map retains every
    // stopped SparkSession for the JVM lifetime (r6 ADVICE); their blocks
    // died with the session, only the map entries linger
    live.keys.filter(_._1.sparkContext.isStopped).foreach(live.remove)
    live.put((s, key), ids).foreach(old => free(s, old))
  }
}
