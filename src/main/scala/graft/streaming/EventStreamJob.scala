package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming faces of the batch event queries (SURVEY.md §2.8).
  *
  * The reference approximates streaming with cron micro-batches (hourly posts
  * DAG, daily comments DAG) and handles late/duplicate data only through PK
  * insert-ignore. The Spark-native equivalents:
  *  - `Trigger.AvailableNow` ≡ the cron batch model (process everything
  *    that has landed, then stop);
  *  - `withWatermark` + windowed agg ≡ the daily tumbling window with a
  *    bounded-lateness contract (the reference silently drops late comments —
  *    SURVEY.md §2.8 documents that as a gap, not a behavior to copy);
  *  - `dropDuplicatesWithinWatermark` ≡ the streaming analogue of A1
  *    insert-ignore dedup.
  *
  * At scale these run identically over a file/Kafka source; tests drive them
  * with the parquet `events` table and a memory sink.
  */
object EventStreamJob {

  /** Streaming schema of the events table after nanos→micros normalization. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw nanos (nanosAsLong read)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events parquet directory. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` at session build
    * ([[graft.Tables.sessionBuilder]]) for the TIMESTAMP(NANOS) column.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-day windowed aggregation with a 1-hour watermark — the
    * streaming face of EventWindows.tumblingDaily.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming insert-ignore: at-most-once per event_id within the watermark
    * — the exact streaming analogue of `ON CONFLICT DO NOTHING`.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming DataFrame to completion over the available input
    * (cron-batch semantics) into a named memory sink; returns the query.
    */
  def runAvailableNow(df: DataFrame, name: String, outputMode: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
