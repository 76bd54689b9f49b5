package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.util.Properties

/** Write-side surface of the engine (SURVEY.md §2.1 S6/S7 generalized).
  *
  * The reference's only sink is a row-at-a-time JDBC insert-ignore
  * (`posts_pipeline.py:53-59`); the Spark-native equivalents below are the
  * layouts a 100 TB corpus actually needs:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning — the scan-side
  *    contract for partition pruning (a date/lang filter prunes whole
  *    directories before any IO).
  *  - [[writeBucketed]]: pre-shuffled, bucket-sorted table layout — joins and
  *    aggregations on the bucket key read co-located buckets and skip the
  *    exchange entirely (verified by `SinksSpec`: the join plan over two
  *    tables bucketed on the same key contains no shuffle).
  *  - [[appendInsertIgnore]]: the re-runnable append the reference's
  *    `ON CONFLICT DO NOTHING` load gives: dedup-within-batch + anti-join
  *    against the current target state, then append.
  *
  * Keeping Postgres as the target instead: feed the same deduped/anti-joined
  * plan to Spark's batched JDBC sink (`df.write.format("jdbc")
  * .option("batchsize", 10000).mode("append")`) — see README "Migrating the
  * reference's Postgres (JDBC) load" for the full call shape and the
  * staging-table MERGE needed for true upsert. The parquet mapping here is
  * semantics-equivalent and what the no-Postgres sandbox verifies.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Dynamic-partition overwrite: replace ONLY the partitions present in
    * `df`, leaving sibling partitions untouched — the idempotent daily
    * backfill/reprocess primitive. The option is set per-write (not
    * session-wide): the default STATIC mode on the same call would
    * truncate every other partition of the table, the classic
    * reprocessing-job data-loss incident this sink exists to prevent
    * (SinksSpec pins both halves: repaired content + untouched-sibling
    * mtimes).
    */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table (bucketing requires saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent append: only rows whose `key` is absent from `target`'s
    * current content are written. Re-running the same batch appends nothing.
    */
  def appendInsertIgnore(incoming: DataFrame, targetPath: String, key: String): Unit = {
    val spark = incoming.sparkSession
    val existing =
      try spark.read.parquet(targetPath).select(key)
      catch { case _: org.apache.spark.sql.AnalysisException => // first load
        return incoming.dropDuplicates(key).write.mode(SaveMode.Append).parquet(targetPath)
      }
    graft.operators.IngestTransforms.insertIgnore(incoming, existing, key)
      .write.mode(SaveMode.Append).parquet(targetPath)
  }

  /** [[appendInsertIgnore]] with a MAINTAINED cross-batch Bloom sketch — the
    * cure for the one O(n²) shape in the streaming tier (SURVEY §13.12a):
    * the plain form re-reads the target's FULL key set every micro-batch, so
    * a long stream pays key-history × batches. Here each batch pays:
    *
    *  1. ONE map-only collect of its xxhash64 key longs (KBs — a
    *     micro-batch is bounded by admission control) probed driver-side
    *     against the standing sketch (MBs, loaded once per batch); keys
    *     the sketch rejects are DEFINITELY new (no false negatives) and
    *     skip the anti-join outright;
    *  2. only might-contain candidates trigger the exact anti-join against
    *     target keys — and with `fpp` at 1e-5 a typical all-new batch has
    *     ZERO candidates, so the history read is SKIPPED entirely; it runs
    *     only on replays (where it must) and on rare false-positive hits.
    *
    * Correctness never rests on the sketch's quality — it rests on one
    * INVARIANT: the sketch is at all times a SUPERSET of the target's keys.
    * That is guaranteed by write order inside each batch: the batch's keys
    * are merged into the sketch and atomically renamed into place BEFORE
    * the target append. A torn batch (sketch updated, append lost, or
    * append landed, checkpoint commit lost) therefore replays against a
    * sketch that already knows every key the target might hold — every
    * batch key probes might-contain and takes the exact anti-join, which
    * resolves against the target's true state. Probing uses the PRE-merge
    * sketch (a superset of the target before this batch, since batches are
    * serial), so "not in old sketch ⇒ not in target" stays sound.
    *
    * Sketch files are versioned (`bloom-v…`), never mutated — the same
    * immutability contract `graft_bloom_might_file`'s executor LRU cache
    * requires; a replay rewrites its version with byte-identical content.
    * Capacity: sized for `capacityHint` keys at `fpp`; when the inserted
    * count outgrows it the sketch is REBUILT from the target's keys at 4×
    * capacity (one narrow scan, amortized geometrically — the dynamic-array
    * argument). At 100 TB the sketch path is shared storage and ~3 bytes
    * per key at 1e-5 — 300 MB per 100M keys, the same ballpark the batch
    * [[graft.operators.IngestTransforms.bloomInsertIgnore]] documents.
    */
  /** Candidate-count ceiling for resolving sketch hits as pushed-down point
    * lookups; above it (a replay re-offering a whole batch) the full exact
    * anti-join is the correct resolution. */
  private val PointLookupMax = 128

  /** Row ceiling for the driver-side sketch path. An admission-controlled
    * micro-batch (the steady state) stays far under it and takes the
    * two-job driver loop; a bulk/backfill batch above it (the r11 100×
    * probe: 5M rows/batch collected 2× slower than the plain anti-join)
    * stays fully distributed — executor-side file probe, one bloom
    * aggregation — and never ships batch-scale hash sets to the driver.
    * Test-adjustable (like [[postAppendHook]]) so specs can drive the
    * large-batch shape without materializing half a million rows. */
  private[graft] var SmallBatchMaxRows = 1 << 19

  def appendInsertIgnoreSketched(incoming: DataFrame, targetPath: String,
      key: String, fpp: Double = 1e-5, capacityHint: Long = 1L << 20,
      expand: DataFrame => DataFrame = identity): Unit =
    sketchedCore(incoming, targetPath, key, fpp, capacityHint,
      dedupBatch = true, expand)

  /** [[appendInsertIgnoreSketched]] for MULTI-ROW-PER-KEY stores (the band
    * index lands 8 rows per doc): novel KEYS keep ALL their rows; nothing
    * dedups within the batch — the caller owns per-key row-group shape
    * (usually via `expand`).
    */
  def appendInsertIgnoreSketchedRows(incoming: DataFrame, targetPath: String,
      key: String, fpp: Double = 1e-5, capacityHint: Long = 1L << 20,
      expand: DataFrame => DataFrame = identity): Unit =
    sketchedCore(incoming, targetPath, key, fpp, capacityHint,
      dedupBatch = false, expand)

  /** `expand` contract: the hash collect reads `incoming` RAW (so keep
    * `incoming` a cheap scan — the key column must exist on it), and any
    * expensive per-row derivation (minhash banding, centroid assignment)
    * goes in `expand`, which runs exactly once, inside the single write
    * action, over only the NOVEL rows. `expand` must preserve `key` and
    * must be row-local per key (every output row of a key derives from
    * that key's input rows), so filtering before expanding ≡ expanding
    * before filtering.
    */
  private def sketchedCore(incoming: DataFrame, targetPath: String,
      key: String, fpp: Double, capacityHint: Long, dedupBatch: Boolean,
      expand: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val spark = incoming.sparkSession
    // read the (test-adjustable) gate ONCE per batch so both the limit
    // plan and the comparison see one value
    val smallMax = SmallBatchMaxRows
    val targetExists =
      try { spark.read.parquet(targetPath).schema; true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    val latest = if (targetExists) BloomStore.latest(targetPath) else None

    // key-exact anti-join honoring the row-shape contract: dedup-within-
    // batch for the 1-row-per-key face, keep-all-rows for the multi-row one
    def novelAgainst(batch: DataFrame, existing: DataFrame): DataFrame =
      if (dedupBatch)
        graft.operators.IngestTransforms.insertIgnore(batch, existing, key)
      else
        batch.join(existing.select(key).dropDuplicates(key), Seq(key), "left_anti")

    // exact fallback for the rare non-steady shapes (bootstrap of a legacy
    // sketchless target; sketch outgrown): one narrow target-key scan, then
    // (re)build the sketch from the target's TRUE keys ∪ the batch
    def exactAndRebuild(batch: DataFrame, recordKeys: Long,
        minCapacity: Long): Unit = {
      val existing = spark.read.parquet(targetPath).select(key)
      val cap = math.max(math.max(capacityHint, minCapacity), recordKeys)
      BloomStore.writeMerged(targetPath, prior = None,
        existing.select(xxhash64(col(key)).as("h"))
          .union(batch.select(xxhash64(col(key)).as("h"))),
        cap, BloomStore.optimalBits(cap, fpp), recordKeys)
      expand(novelAgainst(batch, existing))
        .write.mode(SaveMode.Append).parquet(targetPath)
    }

    (targetExists, latest) match {
      case (false, _) =>
        // first batch: establish the superset invariant BEFORE the first
        // append ever lands. Same size-adaptive shape as the steady state:
        // small batches build the sketch driver-side from the collected
        // hashes; a bulk first load builds it with one distributed
        // `graft_bloom_agg` aggregation instead.
        val hashDf0 = incoming.select(xxhash64(col(key)).as("h"))
        val hs = hashDf0.limit(smallMax + 1)
          .collect().map(_.getLong(0))
        if (hs.length > smallMax) {
          // approx distinct is enough here: the estimate only sizes the
          // sketch (inflated 5%, then 4× geometric headroom so the next
          // bulk batch doesn't trigger an immediate outgrown-rebuild) and
          // seeds the rebuild accounting; dedup of the batch itself is
          // unconditional on the bulk shape — the exactness that
          // `nd == n ⇒ skip the dedup shuffle` needs is not worth a full
          // distinct shuffle over millions of hashes
          val nd0 = math.max(1L,
            (hashDf0.agg(approx_count_distinct(col("h")))
              .head().getLong(0) * 1.05).toLong)
          val cap = math.max(capacityHint, nd0 * 4)
          BloomStore.writeMerged(targetPath, prior = None, hashDf0,
            cap, BloomStore.optimalBits(cap, fpp), nd0)
          val first = if (dedupBatch) incoming.dropDuplicates(key) else incoming
          expand(first).write.mode(SaveMode.Append).parquet(targetPath)
          return
        }
        val distinct = hs.toSet
        val cap = math.max(capacityHint, distinct.size.toLong)
        val bits = BloomStore.optimalBits(cap, fpp)
        val bf = org.apache.spark.util.sketch.BloomFilter.create(cap, bits)
        distinct.foreach(bf.putLong)
        BloomStore.publishNew(targetPath, cap, bits, bf, distinct.size.toLong)
        val first =
          if (!dedupBatch || distinct.size == hs.length) incoming
          else incoming.dropDuplicates(key)
        expand(first).write.mode(SaveMode.Append).parquet(targetPath)
      case (true, None) =>
        // legacy target without a sketch: bootstrap from its true keys.
        // Count DISTINCT keys, not rows — the multi-row-per-key face (band
        // index: 8 rows/doc) would otherwise oversize the sketch ~8× and
        // skew the nKeys-based rebuild accounting.
        val n = incoming.select(col(key)).distinct().count()
        val nTarget =
          spark.read.parquet(targetPath).select(key).distinct().count()
        exactAndRebuild(incoming, recordKeys = nTarget + n,
          minCapacity = nTarget + n)
      case (true, Some(cur)) =>
        // steady state. ONE decision job picks the shape by batch size:
        // limit(T+1).collect() returns EVERY hash when the batch holds
        // ≤ T rows (CollectLimit executes incrementally, so this costs
        // what the plain collect cost) and T+1 rows when it does not.
        //
        // Small batch — the admission-controlled hot path: (1) the hashes
        // are already on the driver; dedup, the probe, and the sketch
        // update run driver-side against the loaded sketch — no per-batch
        // target scan, no capacity-sized aggregation buffers shipping from
        // every task; (2) ONE write job for the novel rows.
        //
        // Large batch (bulk load / backfill / replay of one): everything
        // stays distributed — the probe is the executor-side
        // `graft_bloom_might_file` against the published (immutable)
        // sketch file, the update is one `graft_bloom_agg` aggregation at
        // the current sizing — and the driver never materializes
        // batch-scale hash sets (the r11 100× probe measured the collect
        // shape at 2× the plain anti-join's wall on 5M-row batches).
        def tNow = System.nanoTime()
        val dbg = sys.env.contains("SPARK_GRAFT_SKETCH_DEBUG")
        val t0 = tNow
        val hashDf = incoming.select(xxhash64(col(key)).as("h"))
        val hashArr = hashDf.limit(smallMax + 1)
          .collect().map(_.getLong(0))
        val t1 = tNow
        if (hashArr.length > smallMax) {
          // ONE distributed agg over the batch's hashes: approx key count
          // (sizing/accounting only — see the bulk first-batch note),
          // approx DISTINCT candidate count (keys, not rows: a multi-row-
          // per-key batch must not fall off the point-lookup path just
          // because its few candidate KEYS span many rows) via the
          // executor-side probe of the published (immutable) sketch file,
          // and the batch's bloom bytes at the current sizing — so the
          // scan is paid once, not once per statistic
          val probe = call_function("graft_bloom_might_file",
            lit(cur.file.toString), col("h"))
          val st = hashDf.agg(
            approx_count_distinct(col("h")).as("nd"),
            approx_count_distinct(when(probe, col("h"))).as("nc"),
            call_function("graft_bloom_agg", col("h"),
              lit(cur.capacity), lit(cur.nBits)).as("bf")).head()
          val (nBatchKeys, nCand) =
            (math.max(1L, (st.getLong(0) * 1.05).toLong), st.getLong(1))
          val tStats = tNow
          if (cur.nKeys + nBatchKeys > cur.capacity)
            // discard the built bytes — the rare rebuild resizes anyway
            exactAndRebuild(incoming,
              recordKeys = cur.nKeys + nBatchKeys, minCapacity = cur.capacity * 4)
          else {
            // merge the batch's keys into the next version BEFORE the
            // append — the superset invariant holds at every crash point,
            // exactly as on the small path
            BloomStore.publishMerged(targetPath, Some(cur),
              st.getAs[Array[Byte]]("bf"),
              cur.capacity, cur.nBits, cur.nKeys + nBatchKeys)
            val tMerge = tNow
            val base = if (dedupBatch) incoming.dropDuplicates(key) else incoming
            val novel =
              if (nCand == 0L) base // zero candidates: NO history read
              else if (nCand <= PointLookupMax) {
                val candKeys = incoming
                  .filter(call_function("graft_bloom_might_file",
                    lit(cur.file.toString), xxhash64(col(key))))
                  .select(col(key)).distinct().collect().map(_.get(0)).toSeq
                val found = spark.read.parquet(targetPath).select(key)
                  .filter(col(key).isInCollection(candKeys))
                  .distinct().collect().map(_.get(0)).toSet
                if (found.isEmpty) base
                else base.filter(col(key).isNull ||
                  !col(key).isInCollection(found.toSeq))
              } else {
                // batch-scale candidates — a replay: the exact anti-join
                // is the correct (and unavoidable) resolution
                novelAgainst(base, spark.read.parquet(targetPath).select(key))
              }
            expand(novel).write.mode(SaveMode.Append).parquet(targetPath)
            if (dbg) System.err.println(f"[sketch-large] keys~$nBatchKeys " +
              f"cand=$nCand stats=${(tStats - t1) / 1e9}%.2f " +
              f"merge=${(tMerge - tStats) / 1e9}%.2f " +
              f"resolve+write=${(tNow - tMerge) / 1e9}%.2f " +
              f"wall=${(tNow - t0) / 1e9}%.2f")
          }
          return
        }
        val distinct = hashArr.toSet
        val nBatchKeys = distinct.size.toLong
        // equal counts ⇒ no duplicate hashes ⇒ no duplicate keys: the write
        // can skip the dedup shuffle entirely (a true dup always collides;
        // a cross-key hash collision only costs the harmless fallback)
        val noInBatchDups = distinct.size == hashArr.length
        if (cur.nKeys + nBatchKeys > cur.capacity)
          // outgrown: rebuild at 4× (fpp would otherwise degrade silently
          // — slower, never wrong; the rebuild keeps the zero-candidate
          // fast path alive). Amortized geometric, like a dynamic array.
          exactAndRebuild(incoming,
            recordKeys = cur.nKeys + nBatchKeys, minCapacity = cur.capacity * 4)
        else {
          val bf = BloomStore.load(cur)
          val t2 = tNow
          // probe the PRE-merge sketch: rejected keys are definitely
          // absent from the target (superset invariant)
          val candHashes = distinct.filter(bf.mightContainLong)
          // then merge batch keys into the NEXT sketch version BEFORE the
          // append — the invariant holds at every crash point
          distinct.foreach(bf.putLong)
          val t3 = tNow
          BloomStore.publish(targetPath, cur, bf, cur.nKeys + nBatchKeys)
          val t4 = tNow
          val base =
            if (!dedupBatch || noInBatchDups) incoming
            else incoming.dropDuplicates(key)
          val novel =
            if (candHashes.isEmpty) base // zero candidates: NO history read
            else if (candHashes.size <= PointLookupMax) {
              // a handful of false-positive hits: resolve them as pushed-
              // down point lookups on the key column (parquet footer
              // min/max skips non-matching row groups) instead of a full
              // key-history anti-join
              val candKeys = incoming
                .filter(xxhash64(col(key)).isInCollection(candHashes.toSeq))
                .select(col(key)).distinct().collect().map(_.get(0)).toSeq
              val found = spark.read.parquet(targetPath).select(key)
                .filter(col(key).isInCollection(candKeys))
                .distinct().collect().map(_.get(0)).toSet
              if (found.isEmpty) base
              // null-safe: !isInCollection is NULL (filtered out) for
              // null-key rows, but the exact anti-join keeps them — and all
              // null keys share one xxhash64 (the seed), so a single sketch
              // hit would otherwise silently drop every null-key row
              else base.filter(col(key).isNull ||
                !col(key).isInCollection(found.toSeq))
            } else {
              // candidate set is batch-scale — a replay: the full exact
              // anti-join is the correct (and unavoidable) resolution
              novelAgainst(base, spark.read.parquet(targetPath).select(key))
            }
          expand(novel).write.mode(SaveMode.Append).parquet(targetPath)
          if (dbg) System.err.println(f"[sketch] collect=${(t1 - t0) / 1e9}%.2f " +
            f"load=${(t2 - t1) / 1e9}%.2f probe+put=${(t3 - t2) / 1e9}%.2f " +
            f"publish=${(t4 - t3) / 1e9}%.2f write=${(tNow - t4) / 1e9}%.2f " +
            f"cand=${candHashes.size}")
        }
    }
  }

  /** The reference's actual sink, Spark-native: Postgres row-at-a-time
    * `INSERT ... ON CONFLICT DO NOTHING` (`posts_pipeline.py:53-59`) becomes
    * dedup-within-batch + anti-join against the target table's current keys
    * (read back over the same JDBC connection, key column only), then ONE
    * batched `df.write.jdbc` append. A missing target is created by the
    * append itself (Spark's JDBC `SaveMode.Append` creates absent tables).
    *
    * Semantics match [[appendInsertIgnore]] exactly — re-running the same
    * batch appends nothing (integration-tested against embedded Derby in
    * `SinksSpec`). Contract: the anti-join guards against keys present
    * BEFORE this batch; concurrent writers racing the same key still need
    * the database's own conflict clause (the staging-table MERGE the README
    * documents) — same caveat the reference's per-row loop has between its
    * SELECT and INSERT.
    *
    * Scale shape: only the key column crosses the wire on the read side
    * (column pruning is pushed into the JDBC SELECT); the write is batched
    * (`batchsize`) and parallel per partition — `incoming`'s partition count
    * is the write concurrency, so `coalesce` upstream if the database can't
    * take that many connections.
    */
  /** Compacted write: lay the output down as ~`rowsPerFile`-row parquet
    * files, key-clustered — the small-files defense every long-running
    * 100 TB pipeline needs (a thousand executors each flushing per-task
    * files turns the next stage's scan into millions of opens; metadata
    * servers, not IO, become the bottleneck).
    *
    * `repartitionByRange` on the cluster key gives (a) a file count chosen
    * by DATA SIZE, not by whatever parallelism the upstream stage happened
    * to have, and (b) files covering disjoint key ranges, so min/max footer
    * stats turn key-range predicates into whole-file skips on read —
    * clustering and compaction from one shuffle. `maxRecordsPerFile` is the
    * hard cap backstop when range sampling under-splits a hot key.
    *
    * AQE note: `repartitionByRange(n, …)` with an explicit N is exempt from
    * AQE coalescing, so the file count contract holds under AQE.
    */
  def writeCompacted(df: DataFrame, path: String, clusterCol: String,
      rowsPerFile: Long, totalRows: Long,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val nFiles = math.max(1L, (totalRows + rowsPerFile - 1) / rowsPerFile).toInt
    val key = org.apache.spark.sql.functions.col(clusterCol)
    // the local sort is what makes footer min/max TIGHT per file (range
    // partitioning alone bounds the partition, not the file) — and it is
    // task-local: no extra shuffle beyond the range exchange
    df.repartitionByRange(nFiles, key)
      .sortWithinPartitions(key)
      .write.mode(mode)
      .option("maxRecordsPerFile", rowsPerFile.toString)
      .parquet(path)
  }

  /** Streaming idempotent sink: a `foreachBatch` writer running the same
    * insert-ignore semantics as [[appendInsertIgnore]] per micro-batch —
    * the Structured Streaming face of the reference's production sink
    * (cron batch → `INSERT ... ON CONFLICT DO NOTHING`,
    * `posts_pipeline.py:53-59`). Exactly-once lands as at-least-once
    * delivery × key-idempotent writes: a replayed micro-batch (restart
    * without a committed epoch) re-offers rows whose keys already exist and
    * appends nothing. The per-batch dedup guards duplicate keys INSIDE one
    * batch; the cross-batch/restart guard is the SKETCHED insert-ignore
    * ([[appendInsertIgnoreSketched]], r11 — previously the plain
    * [[appendInsertIgnore]]): the per-batch key read is the maintained
    * Bloom file, never the growing target's key history; the exact
    * anti-join runs only on replays (where the candidate set is
    * batch-scale and the full resolution is unavoidable) and on rare
    * false-positive hits (resolved as pushed-down point lookups).
    *
    * Per-batch read-shape audit of every streaming sink here (r10 verdict
    * task 5):
    *  - [[streamInsertIgnore]], [[streamQuarantine]] (both legs),
    *    [[streamVectorIndex]], [[streamBandIndex]]: sketched — O(sketch)
    *    per batch, never O(history).
    *  - [[streamScd2]]: EXEMPT by algebra — the SCD2 merge must join each
    *    batch against the dimension's OPEN SLICE (is_current rows) to close
    *    changed versions; that read is dimension-sized by definition, and a
    *    dimension (entities) grows ~log-scale vs its fact stream. A Bloom
    *    sketch cannot answer "which tracked attrs does the open row carry".
    *  - [[streamSketchStore]]: reads its own store per batch, but the store
    *    is the AGGREGATE — bounded by |days × event_types|, not by event
    *    history; the re-read is group-count-sized forever.
    *  - [[streamDailyRollup]]: reads only the batch's AFFECTED DAY
    *    partitions (static pruning over a driver literal day list) on both
    *    the anti-join and the refresh — bounded by days-per-batch, not
    *    history (measured 74.8 → 38.7 s at the 100× replica).
    *
    * Returns the started query; callers drive it (the default AvailableNow
    * for cron-equivalent runs, processing-time triggers for continuous).
    */
  def streamInsertIgnore(stream: DataFrame, targetPath: String, key: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendInsertIgnoreSketched(batch, targetPath, key)
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Test-only fault injection: invoked AFTER a micro-batch's append lands
    * but BEFORE foreachBatch returns (i.e. before the checkpoint commit) —
    * throwing here simulates a crash that tears the batch, the failure mode
    * the exactly-once claim must survive (r6 verdict task 5). Production
    * code never sets it.
    */
  private[graft] var postAppendHook: Long => Unit = _ => ()

  /** Streaming SCD Type-2 sink: each micro-batch merges into the versioned
    * dimension ([[graft.operators.Scd.scd2Merge]]) and the full updated
    * snapshot replaces the target. Replay safety comes from the merge, not
    * the write: re-merging the LAST batch is a NO-OP (its tracked attrs
    * already equal the open rows), so a torn batch (merge written,
    * checkpoint commit lost) replays into an identical snapshot — the same
    * at-least-once × idempotent-operation argument as [[streamInsertIgnore]],
    * with "idempotent" supplied by the merge algebra instead of the
    * anti-join. Scope: the checkpoint's serial commit is what guarantees
    * only the last batch can replay; re-applying an OLDER batch out of
    * order would legitimately re-version (SCD2 is order-sensitive by
    * definition), which is why the checkpoint must never be reset against
    * a kept target.
    *
    * The read-modify-overwrite round-trip goes through a per-batch staging
    * path then an atomic directory swap would be the production form on
    * object storage; in the sandbox the overwrite-after-read is enough
    * because foreachBatch batches are serial within a query.
    */
  def streamScd2(stream: DataFrame, targetPath: String, key: String,
      tracked: Seq[String], effCol: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val current =
          try spark.read.parquet(targetPath)
          catch { case _: org.apache.spark.sql.AnalysisException => // first load
            import org.apache.spark.sql.functions._
            batch.limit(0).select(
              (col(key) +: tracked.map(col)
                :+ col(effCol).cast("timestamp_ntz").as("valid_from")
                :+ lit(null).cast("timestamp_ntz").as("valid_to")
                :+ lit(true).as("is_current")): _*)
          }
        val merged = graft.operators.Scd
          .scd2Merge(current, batch, key, tracked, effCol)
          .localCheckpoint() // sever the lineage from the files being replaced
        merged.write.mode(SaveMode.Overwrite).parquet(targetPath)
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the HLL sketch store
    * ([[graft.operators.Layouts]]): each micro-batch folds its events into
    * the per-(day, event_type) user sketches — the incrementally-maintained
    * materialized view that makes DISTINCT COUNT (which plain counters
    * cannot maintain incrementally) a streaming aggregate at 100 TB.
    *
    * Replay safety comes from the SKETCH ALGEBRA, with no anti-join and no
    * merge bookkeeping: HLL union is register-wise max, so re-unioning a
    * replayed batch's sketch into a store that already absorbed it is a
    * no-op — idempotence is a property of the aggregate itself. That is
    * exactly why the store carries no event counters: a `n_events` sum
    * would double on replay, and exactly-once for it would need the
    * anti-join machinery of [[streamInsertIgnore]]. Sketches only → torn
    * batches (crash after write, before checkpoint commit) replay into an
    * identical store (proven in LayoutsSpec).
    */
  def streamSketchStore(stream: DataFrame, storePath: String,
      checkpointDir: String, lgK: Int = 14,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val delta = batch
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lgK).as("user_sketch"))
        val current =
          try spark.read.parquet(storePath)
          catch { case _: org.apache.spark.sql.AnalysisException => delta.limit(0) }
        val merged = current.unionByName(delta)
          .groupBy(col("day"), col("event_type"))
          .agg(hll_union_agg(col("user_sketch"), allowDifferentLgConfigK = false)
            .as("user_sketch"))
          .localCheckpoint() // sever lineage from the files being replaced
        merged.write.mode(SaveMode.Overwrite).parquet(storePath)
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming-maintained DAILY ROLLUP materialized view — the
    * serve-from-aggregates pattern every event pipeline converges on:
    * each micro-batch (1) lands in an insert-ignore landing keyed on
    * event_id, then (2) re-aggregates ONLY the days the batch touched
    * FROM THE SETTLED LANDING and dynamic-partition-overwrites those
    * day partitions of the rollup table.
    *
    * Replay safety composes two idempotent steps — no transaction log:
    * the landing append replays to nothing ([[appendInsertIgnore]]'s
    * anti-join), and the refresh is recompute-from-log — rewriting a
    * partition with content derived from the landing state, so running
    * it twice writes the same bytes. The tempting shortcut (add the
    * batch's partial aggregates into the rollup in place) double-counts
    * on any replay and is exactly what this shape exists to avoid; the
    * same argument as [[streamSketchStore]]'s counters note, solved by
    * recomputation instead of by an idempotent algebra. A torn batch
    * (landing committed, refresh crashed before the checkpoint commit)
    * self-heals: the replay's append is a no-op and its refresh
    * completes the interrupted one (SinksSpec).
    *
    * Scale shape: refresh work ∝ the landing rows of AFFECTED days only
    * (partition-pruned scan — a day-partitioned landing makes that
    * layout-enforced), never the table; the overwrite touches only
    * those day directories.
    */
  def streamDailyRollup(stream: DataFrame, landingPath: String,
      rollupPath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        // landing is DAY-PARTITIONED so the refresh prunes to affected
        // days at planning time — at 100 TB the refresh reads the touched
        // day directories, never the table (measured 74.8 s → 38.7 s at
        // the 100× replica vs an unpartitioned landing; the remaining cost
        // is the partitioned append itself)
        val withDate = batch.withColumn("event_date", to_date(col("ts")))
        // the affected-day set is bounded (days per batch), so a driver
        // literal IN-list buys STATIC partition pruning — the trained-
        // centroids precedent for tiny, bounded driver-side model state
        val days = batch.select(to_date(col("ts")).as("event_date")).distinct()
          .collect().map(_.getDate(0)).toSeq
        // the dedup anti-join also reads only the affected days: replays
        // re-offer IDENTICAL rows (same ts ⇒ same day partition), so keys
        // outside the batch's days cannot collide — without the prune this
        // read grows O(total landing) per batch, defeating the layout
        val novel =
          try {
            val existing = spark.read.parquet(landingPath)
              .filter(col("event_date").isInCollection(days))
              .select("event_id")
            graft.operators.IngestTransforms.insertIgnore(withDate, existing, "event_id")
          } catch { case _: org.apache.spark.sql.AnalysisException => // first load
            withDate.dropDuplicates("event_id")
          }
        novel.write.mode(SaveMode.Append)
          .partitionBy("event_date").parquet(landingPath)
        // refresh reads the landing and writes the ROLLUP — disjoint paths,
        // so no lineage-severing checkpoint is needed here (unlike the
        // self-overwriting streamScd2/streamSketchStore round-trips)
        val refreshed = spark.read.parquet(landingPath)
          .filter(col("event_date").isInCollection(days))
          .groupBy(col("event_date"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        overwritePartitionsDynamic(refreshed, rollupPath, Seq("event_date"))
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming dead-letter queue — the error-handling face of the
    * streaming tier ([[graft.sources.JsonLanding.quarantineReport]]'s
    * batch contract, live): each micro-batch of raw JSONL lines splits on
    * parseability — parsed records append to the target keyed on their id,
    * unparseable lines land in the DLQ keyed on a content hash (a raw
    * line has no id; md5 of the line is the only stable key it owns).
    * Both legs are insert-ignore appends, so replays (torn batch: one or
    * both legs landed, checkpoint commit lost) re-offer rows whose keys
    * exist and append nothing — the [[streamInsertIgnore]] argument,
    * applied per leg. A malformed line is detected by `from_json` yielding
    * a null `idCol` (every record this pipeline lands serializes its id,
    * so a missing id ⇔ an unparseable line).
    *
    * Scale shape: the split is row-local in the batch; each leg runs the
    * SKETCHED insert-ignore ([[appendInsertIgnoreSketched]]), so the
    * per-batch key read is the maintained Bloom file, not the growing
    * store — the r9-flagged O(history × batches) anti-join is gone; the
    * exact check runs only on replays and false-positive hits.
    */
  def streamQuarantine(lines: DataFrame, schemaDdl: String, idCol: String,
      targetPath: String, dlqPath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val parsed = batch
          .withColumn("_p", from_json(col("value"), schemaDdl, Map.empty[String, String]))
        val good = parsed.filter(col(s"_p.$idCol").isNotNull).select(col("_p.*"))
        val bad = parsed.filter(col(s"_p.$idCol").isNull)
          .select(col("value").as("raw"), md5(col("value")).as("raw_key"))
        appendInsertIgnoreSketched(good, targetPath, idCol)
        appendInsertIgnoreSketched(bad, dlqPath, "raw_key")
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the IVF vector index — the embeddings
    * analogue of [[streamBandIndex]]'s daily-crawl loop: each micro-batch
    * of (vec_id, embedding) rows is assigned to its nearest TRAINED
    * coarse cell ([[graft.operators.Similarity.assignCells]] — the same
    * broadcast-literal argmax the batch index uses, against the same
    * fitted model) and lands append-only as (vec_id, centroid_id).
    * Assignment is a pure function of the vector value and the frozen
    * model, so batches index independently; replay safety is the
    * SKETCHED insert-ignore keyed on vec_id
    * ([[appendInsertIgnoreSketched]]), so the per-batch key read is the
    * maintained Bloom file, never the growing index. Model refresh
    * (retraining centroids as the corpus drifts) is a rebuild, not an
    * append — exactly as in a production IVF index.
    */
  def streamVectorIndex(stream: DataFrame, centroids: Array[Array[Double]],
      storePath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch itself carries vec_id, so novelty probes the raw scan;
        // the centroid-assignment argmax runs once, over novel rows only
        appendInsertIgnoreSketched(batch, storePath, "vec_id",
          expand = b => graft.operators.Similarity.assignCells(b, centroids))
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming semantic-contamination screen — the decontamination twin of
    * [[streamVectorIndex]], because incremental corpus ingestion is exactly
    * where a screen runs in production: each micro-batch of (vec_id,
    * embedding) TRAINING rows is screened against the frozen eval probe set
    * ([[graft.operators.Similarity.contaminationEvalProbes]] — evals ×
    * nprobe rows, a pure function of the frozen model), and the verified
    * hit PAIRS (vec_id, eval_id, cosine) land append-only. The screen is
    * [[graft.operators.Similarity.screenCandidates]] — the batch face's own
    * blocking (argmax cell as a per-row projection over centroid literals,
    * so it is map-side and streaming-safe) — run as the sketched sink's
    * `expand`, i.e. once, over novel rows only, inside the single write
    * action. Row-local per vec_id, so filter-then-expand ≡
    * expand-then-filter (the `expand` contract).
    *
    * Replay safety: keyed on vec_id via [[appendInsertIgnoreSketchedRows]]
    * (a hit vector's pair rows land atomically in its batch's append — key
    * presence ⇒ the full row group); a vector with NO hits appends nothing
    * and simply re-screens to nothing on a replay — idempotent both ways.
    * The settled store's rollup equals the batch face over the same corpus
    * (SinksSpec pins it), which is what lets one generated oracle check
    * both.
    */
  def streamSemanticContamination(stream: DataFrame,
      centroids: Array[Array[Double]], evalProbes: DataFrame,
      threshold: Double, storePath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendInsertIgnoreSketchedRows(batch, storePath, "vec_id",
          expand = b => graft.operators.Similarity
            .screenCandidates(b, centroids, evalProbes)
            .filter(org.apache.spark.sql.functions.col("cosine") >= threshold))
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the MinHash-LSH band index
    * ([[graft.operators.Dedup]]): each micro-batch of (doc_id, text) docs
    * lands its per-doc (doc_id, skey, band, band_key) rows append-only —
    * the daily-crawl loop's standing index, maintained as batches are
    * admitted instead of rebuilt per probe. Banding is a pure function of
    * a doc's own content (md5-derived), so batches index independently —
    * no cross-batch state beyond the store itself.
    *
    * Replay safety is the SKETCHED insert-ignore keyed on doc_id
    * ([[appendInsertIgnoreSketchedRows]] — the multi-row face: a novel doc
    * keeps ALL 8 band rows, nothing dedups within the batch), so the
    * per-batch key read is the maintained Bloom file, never a distinct
    * scan of the growing 8-rows-per-doc store. A doc's band rows land
    * atomically in its batch's append, so key-level presence ⇒ the full
    * row group is present, and a torn batch (append landed, checkpoint
    * commit lost) replays to nothing (SinksSpec).
    */
  def streamBandIndex(stream: DataFrame, storePath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // novelty probes the raw doc batch; shingling + minhash banding run
        // once, over novel docs only, inside the single write action.
        // The explicit repartition fans the CPU-heavy minhash across the
        // session width (r16 task 4): the expand otherwise inherits the
        // batch SCAN's partitioning, and text compresses ~4:1 in parquet,
        // so byte-sized scan splits leave a 100×-replica batch's ~160 s of
        // signature CPU on a handful of tasks (the q_stream_enrich lesson
        // applied to the one stream whose map side is compute, not I/O —
        // a 100k-row text shuffle costs far less than the skew it cures).
        appendInsertIgnoreSketchedRows(batch, storePath, "doc_id",
          expand = b => graft.operators.Dedup.docBands(
            graft.operators.Dedup.keyedShingles(
              b.repartition(org.apache.spark.sql.functions.col("doc_id")))))
        postAppendHook(batchId)
      }
      .trigger(trigger)
      .start()

  def writeJdbcInsertIgnore(incoming: DataFrame, url: String, table: String,
      key: String, props: Properties = new Properties(),
      batchSize: Int = 10000): Unit = {
    val spark = incoming.sparkSession
    // read.jdbc resolves the schema eagerly, so an absent target throws here
    val existing =
      try Some(spark.read.jdbc(url, table, props).select(key))
      catch { case _: Throwable => None } // first load: no target yet
    val toWrite = existing match {
      case Some(keys) => graft.operators.IngestTransforms.insertIgnore(incoming, keys, key)
      case None       => incoming.dropDuplicates(key)
    }
    toWrite.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
  }
}
