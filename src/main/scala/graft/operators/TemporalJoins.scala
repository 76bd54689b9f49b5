package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — as-of join and
  * bounded-range join — built from shuffle-once primitives (SURVEY.md §2.4
  * marks these ABSENT in the reference; they are the standard event-time
  * operations a training-data/event pipeline needs).
  *
  * Scale shapes:
  *  - As-of join: the classic union-merge construction — tag both sides,
  *    union, ONE hash shuffle on the key, one sort per partition, a
  *    `last(..., ignoreNulls)` running window. No range explosion, no
  *    broadcast requirement, no O(n·m) candidate pairs; skew is bounded by
  *    the per-key event density like any window query.
  *  - Range join: equi-join on (key, time-bucket) with the probe side
  *    exploded to the buckets its interval overlaps — candidate pairs are
  *    bounded by bucket co-occupancy instead of the key-only cartesian, and
  *    the exact range predicate filters inside the join. Bucket width is the
  *    interval length, so each probe expands to exactly 2 buckets.
  */
object TemporalJoins {

  /** Generic as-of join: for every left row, the single latest right row with
    * `right.ts <= left.ts` and equal keys (inner semantics — unmatched left
    * rows drop).
    *
    * `rightPayload` columns are carried to the output prefixed as given.
    * Concurrent right rows at the same (key, ts) resolve deterministically to
    * the max-`tieBreak` row — not via a separate dedup pass, but by adding
    * the tie-break to the merge window's sort: the running `last()` then
    * lands on the max-tieBreak row of any equal-timestamp run. ONE shuffle
    * total.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieBreak: String,
      rightPayload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct(rightPayload.map(col): _*)
    val rightTagged = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        col(tieBreak).as("__tb") :+ payload.as("__payload"): _*)
    val leftCols = left.columns.filterNot(c => c.startsWith("__"))
    val leftTagged = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(rightTagged.schema("__tb").dataType).as("__tb") :+
        lit(null).cast(rightTagged.schema("__payload").dataType).as("__payload") :+
        struct(leftCols.map(col): _*).as("__lrow"): _*)
    // at equal ts right rows sort first (__side 0 < 1 → `<=` semantics),
    // ordered among themselves by tieBreak so last() = max-tieBreak row
    val merge = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.withColumn("__lrow", lit(null).cast(leftTagged.schema("__lrow").dataType))
      .unionByName(leftTagged)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(merge))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** As-of query over `events`: each purchase joined to the same user's
    * latest view at-or-before the purchase time.
    */
  def purchaseAsOfView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"), col("value").as("view_value"))
    asOfJoin(purchases, views, Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", tieBreak = "view_event_id",
      rightPayload = Seq("view_ts", "view_event_id", "view_value"))
  }

  /** Bounded-range join over `events`: per error event, how many clicks the
    * same user made within the following hour ([ts, ts + 1h)). Bucket width =
    * interval length → each error probes exactly its own and the next bucket.
    */
  def errorsFollowedByClicks(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def hourBucket(ts: Column): Column =
      floor(unix_micros(ts.cast("timestamp")) / (3600L * 1000000L))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withColumn("bucket", hourBucket(col("c_ts")))
    val probes = errors
      .withColumn("bucket", explode(array(hourBucket(col("ts")),
        hourBucket(col("ts")) + 1)))
    // The inner probe join + a final left_outer against the (pushed,
    // selective) errors slice stays deliberately: an r21 draft made the
    // probe join LEFT OUTER to drop the third events scan, and the 100×
    // replica measured it 1.46× SLOWER (3.6 → 5.3 s,
    // BENCH_100x_touched_r21_*.json) — every error's two probe rows then
    // ride the join output and the aggregate whether or not they match,
    // which at dense-history scale costs more than one extra
    // type-filtered columnar scan.
    val counts = probes.join(clicks,
        probes("bucket") === clicks("bucket") &&
          probes("user_id") === clicks("c_user") &&
          clicks("c_ts") >= probes("ts") &&
          clicks("c_ts") < probes("ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(probes("event_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
    errors.select(col("event_id"), col("user_id"))
      .join(counts, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }
}
