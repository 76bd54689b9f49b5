package graft

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-query, per-phase wall-clock attribution that lands IN the bench
  * artifact (r10 verdict task 1).
  *
  * Background: the graph pair has carried per-phase stderr attribution since
  * round 8 ([[graft.operators.Graphs]]), but the `q_stream_*` faces did not —
  * so when the r10 driver window showed `q_stream_tumbling` at 25.0 s against
  * a 4.3 s clean rehearsal, the artifact could not say whether the excess was
  * staging I/O, state-store commits, sentinel flush batches, or co-tenant
  * noise. This registry closes that: [[Bench]] scopes each query's run
  * (`begin`/`end` on the worker thread), the streaming harness records named
  * phases as it executes, and the final bench JSON carries a
  * `"phases":{query:{phase:secs}}` map alongside the per-query totals.
  *
  * Phase vocabulary for a streaming face:
  *  - `staging`      — one-time landing construction (slice writes); absent
  *                     on a cached-landing rerun, so a retry's phase map
  *                     isolates pure stream cost;
  *  - `stream_wall`  — start-to-settle wall of the streaming query;
  *  - `n_batches`    — micro-batch count (a count, not seconds);
  *  - `p_<metric>`   — sums of Spark's own per-batch `durationMs` entries
  *                     across batches (`p_addBatch`, `p_walCommit`,
  *                     `p_commitOffsets`, `p_latestOffset`,
  *                     `p_queryPlanning`, `p_triggerExecution`);
  *    `p_triggerExecution` ≈ the whole batch and CONTAINS the others —
  *    these are attribution coordinates, not disjoint accounting;
  *  - `p_stateCommit` / `p_stateUpdates` — state-store commit / update time
  *    summed over operators, batches AND partitions (task-parallel time, so
  *    it can legitimately exceed wall).
  * `stream_wall − p_triggerExecution` is the harness overhead outside batch
  * execution (AvailableNow planning, source listing, settle); a driver-window
  * number far above all recorded phases indicates time lost to the BOX
  * (co-tenant load between batches), which is exactly the distinction the r10
  * artifact could not draw.
  *
  * Recording is a no-op unless the calling thread is inside a
  * `begin`/`end` scope — `graft.Verify` and unit tests run the same code
  * paths with zero bookkeeping. Writes are thread-scoped by construction
  * (each bench worker records only its own query), and the map is bounded by
  * the query count.
  */
object BenchPhases {
  private val current = new ThreadLocal[String]
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Double]]()

  /** Scope the calling thread's recordings to `query`, discarding any
    * phases from a previous run of the same query (a budget retry must
    * report ITS phases, not a merge of both runs). */
  def begin(query: String): Unit = { acc.remove(query); current.set(query) }

  def end(): Unit = current.remove()

  def add(phase: String, secs: Double): Unit = {
    val q = current.get()
    if (q != null)
      acc.computeIfAbsent(q,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
        .merge(phase, secs, (a: Double, b: Double) => a + b)
  }

  def timed[T](phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally add(phase, (System.nanoTime() - t0) / 1e9)
  }

  /** Fold a finished streaming query's own progress telemetry into the
    * current scope (micro-batch count + per-metric duration sums).
    * `p_stateRows` is the PEAK state volume — max across batches of the
    * total rows maintained over all state operators — the machine-readable
    * sizing the stream-join over_contract adjudication reads together with
    * `p_stateUpdates` (state rows × per-row cost; r17 verdict task 3). A
    * face settling several streams sums their peaks — total state the face
    * maintained.
    */
  def attribute(q: StreamingQuery): Unit = {
    val progs = q.recentProgress
    add("n_batches", progs.length.toDouble)
    progs.foreach { p =>
      p.durationMs.forEach((k, v) => add("p_" + k, v.toDouble / 1000.0))
      p.stateOperators.foreach { so =>
        add("p_stateCommit", so.commitTimeMs.toDouble / 1000.0)
        add("p_stateUpdates", so.allUpdatesTimeMs.toDouble / 1000.0)
      }
    }
    val peakRows = progs.foldLeft(0L) { (m, p) =>
      math.max(m, p.stateOperators.map(_.numRowsTotal).sum) }
    if (peakRows > 0L) add("p_stateRows", peakRows.toDouble)
  }

  /** `awaitTermination` under a `stream_wall` phase + progress attribution —
    * the drop-in for the harness's `Sinks.streamX(...).awaitTermination()`
    * call shape. */
  def settle(q: StreamingQuery): Unit = {
    timed("stream_wall")(q.awaitTermination())
    attribute(q)
  }

  /** Phases recorded for `query` in its latest `begin` scope, if any. */
  def snapshot(query: String): Option[Map[String, Double]] = {
    val m = acc.get(query)
    if (m == null || m.isEmpty) None
    else {
      import scala.jdk.CollectionConverters._
      Some(m.asScala.map { case (k, v) => k -> v.doubleValue }.toMap)
    }
  }
}
