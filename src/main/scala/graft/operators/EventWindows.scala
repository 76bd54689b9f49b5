package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window analytics over `events` — the batch faces of the streaming
  * surface (SURVEY.md §2.8). The same `window`/`session_window` expressions run
  * under Structured Streaming in [[graft.streaming.EventStreamJob]]; batch
  * versions here are what the DuckDB oracle can check.
  *
  * Spark's `window()` aligns tumbling windows to the epoch in the session
  * time zone (UTC here), so a 1-day window ≡ `date_trunc('day', ts)` — the
  * oracle SQL uses exactly that equivalence.
  */
object EventWindows {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Tumbling 1-day windows: count + exact decimal sum per (day, event_type). */
  def tumblingDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows: 1-day length, 12-hour slide. Each event lands in two
    * windows; the oracle reproduces this as a UNION ALL of two bucketings.
    */
  def slidingHalfDay(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day", "12 hours"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("n"), col("sum_value"))

  /** Session windows with a 30-minute gap, per user. Batch `session_window`
    * emits [min(ts), max(ts)+gap); the oracle recomputes sessions with the
    * classic gaps-and-islands (lag + cumulative flag sum) construction.
    */
  def sessionize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Semi-structured JSON column access (`events.props` mirrors the
    * reference's stringified-JSON columns, `init_db_tables.sh:15-32`):
    * extract `$.k`, then aggregate it relationally.
    */
  def jsonExtractAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
}
