package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-LAYOUT-aware query faces: the three physical-design levers that
  * decide whether a 100 TB deployment reads terabytes or gigabytes —
  * co-bucketed joins (no exchange), hive-partitioned scans (prune whole
  * directories), and a materialized sketch store (aggregate once, query
  * many). The write side lives in [[graft.sources.Sinks]]; these faces stage
  * the layout once per (session, dataset) and run the driver-checked query
  * against it, so the ORACLE proves the layout changes the plan, never the
  * answer.
  *
  * The reference has no layout tier at all — its one table is a Postgres
  * heap loaded row-at-a-time (`posts_pipeline.py:53-59`); these are the
  * structures its queries would need the moment the data outgrows one node.
  */
object Layouts {

  /** Staged layouts, once per (session, dataset): bucketing registers
    * catalog tables and partitioning writes directories — both must be
    * reused across repeated in-session runs (Bench runs every query twice
    * on a breach retry) instead of re-staged. Keyed by session because
    * catalog entries die with their session.
    */
  private val stagedBucketed =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  private val stagedPartitioned =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private val stagedSketches =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private val tableSeq = new java.util.concurrent.atomic.AtomicLong()

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // ------------------------------------------------------------- bucketing

  /** lineitem + orders co-bucketed on the order key (16 buckets, sorted).
    * The write pays ONE shuffle; every subsequent join/agg on the key reads
    * co-located buckets and skips the exchange — the amortization contract
    * bucketing exists for. At 100 TB the bucket count scales with data
    * volume (buckets ≈ table bytes / target partition bytes); 16 matches
    * the test scale.
    */
  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    stagedBucketed.getOrElseUpdate((s, d), {
      val id = tableSeq.incrementAndGet()
      val (li, ord) = (s"graft_li_bkt_$id", s"graft_ord_bkt_$id")
      graft.sources.Sinks.writeBucketed(Tables.lineitem(s, d), li, "l_orderkey", 16)
      graft.sources.Sinks.writeBucketed(Tables.orders(s, d), ord, "o_orderkey", 16)
      (li, ord)
    })

  /** Driver face: the [[Analytics.saltedJoinRevenue]] aggregate computed
    * over the co-bucketed layout — same oracle semantics, zero-shuffle join
    * physical plan (no `ShuffleExchange` below the sort-merge join;
    * plan-asserted in LayoutsSpec). The `merge` hint pins SMJ so the
    * bucket-partitioning reuse is what's demonstrated, not a broadcast that
    * would also elide the exchange (and could not at 100 TB, where both
    * sides are fact-sized).
    */
  def bucketedJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val (liT, ordT) = bucketedTables(s, d)
    val li = s.table(liT).select(col("l_orderkey"), col("l_extendedprice"))
    val ord = s.table(ordT).select(col("o_orderkey"), col("o_orderstatus"))
    li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------- partitioning

  /** events re-laid hive-partitioned by `event_date` (directory per day) —
    * the layout under which a date predicate prunes whole directories
    * BEFORE any file IO (PartitionFilters in the scan, not PushedFilters:
    * pruning happens at planning, against the file index). Day granularity
    * keeps directory counts sane at 100 TB (365/yr × sources, not 8760
    * hourly dirs); finer slicing belongs to the in-file row-group stats
    * ([[graft.sources.Sinks.writeCompacted]]'s min/max clustering).
    */
  private def partitionedEventsPath(s: SparkSession, d: String): String =
    stagedPartitioned.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft_events_bydate")
      graft.sources.Sinks.writePartitioned(
        Tables.events(s, d).withColumn("event_date", to_date(col("ts"))),
        dir.toString, Seq("event_date"))
      dir.toFile.deleteOnExit()
      dir.toString
    })

  /** Driver face: one week of a 30-day table — 23 of 30 day-directories are
    * never opened (plan-asserted: the scan's partition count equals the
    * selected days). The oracle recomputes from the UNPARTITIONED events
    * parquet, proving layout-independence of the answer.
    */
  def partitionPrunedDaily(s: SparkSession, d: String,
      lo: String = "2024-01-10", hi: String = "2024-01-16"): DataFrame =
    s.read.parquet(partitionedEventsPath(s, d))
      .filter(col("event_date").between(lit(lo).cast("date"), lit(hi).cast("date")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      // pruning runs on the DATE-typed partition column above; the output
      // projection matches the repo-wide day convention (timestamp_ntz —
      // DuckDB's naive TIMESTAMP)
      .select(col("event_date").cast("timestamp_ntz").as("event_date"),
        col("event_type"), col("n_events"), col("sum_value"))

  // ---------------------------------------------------------- sketch store

  /** Per-(day, event_type) HLL sketches of the user set, materialized once
    * (Apache DataSketches via `hll_sketch_agg`, lgK = 14 → rsd ≈ 0.81%).
    * This is the "aggregate once, query many" pattern for 100 TB distinct
    * counting: the raw events are scanned ONE time ever; any day-range's
    * distinct-user count is then a merge over ≤ days × types kilobyte
    * sketches — no re-scan, and sketch union is lossless w.r.t. the HLL
    * guarantee (unlike pre-counted distincts, which cannot merge).
    */
  private[graft] def sketchStorePath(s: SparkSession, d: String): String =
    stagedSketches.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft_sketch_store")
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), 14).as("user_sketch"),
          count(lit(1)).as("n_events"))
        .write.mode("overwrite").parquet(dir.toString)
      dir.toFile.deleteOnExit()
      dir.toString
    })

  /** The VERIFIABLE face of the sketch store (the
    * [[Analytics.approxDistinctUsersChecked]] pattern): merge two weeks of
    * per-day sketches, gate the merged estimate against the exact distinct
    * in-plan (`assert_true`, bound = `boundFactor`·rsd), and emit the exact
    * count + the literally-true flag for the driver's hash. The exact
    * recount exists only to verify; the PRODUCT path at 100 TB is the
    * sketch merge alone (kilobytes in, one number out).
    */
  def sketchStoreChecked(s: SparkSession, d: String,
      lo: String = "2024-01-08", hi: String = "2024-01-21",
      boundFactor: Double = 3.0): DataFrame =
    sketchStoreCheckedAt(s, d, sketchStorePath(s, d), lo, hi, boundFactor)

  /** Same checked face over an EXPLICIT store path — shared by the batch
    * store above and the streaming-maintained one
    * ([[graft.sources.Sinks.streamSketchStore]]): one oracle, two
    * maintenance paths.
    */
  def sketchStoreCheckedAt(s: SparkSession, d: String, storePath: String,
      lo: String = "2024-01-08", hi: String = "2024-01-21",
      boundFactor: Double = 3.0): DataFrame = {
    val rsd = 1.04 / math.sqrt((1 << 14).toDouble)
    val bound = boundFactor * rsd
    val approx = s.read.parquet(storePath)
      .filter(col("day").between(lit(lo).cast("date"), lit(hi).cast("date")))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("user_sketch"), allowDifferentLgConfigK = false))
        .as("approx_users"))
    val exact = Tables.events(s, d)
      .filter(to_date(col("ts")).between(lit(lo).cast("date"), lit(hi).cast("date")))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val relErr = abs(col("approx_users") - col("n_users")).cast("double") /
      col("n_users").cast("double")
    val inBound = when(col("n_users") === 0, col("approx_users") === 0)
      .otherwise(relErr <= lit(bound))
    exact.join(broadcast(approx), Seq("event_type"))
      .filter(assert_true(inBound,
        concat(lit(s"sketch-store estimate beyond $boundFactor*rsd=$bound for "),
          col("event_type"))).isNull)
      .select(col("event_type"), col("n_users"), inBound.as("within_bound"))
  }
}
