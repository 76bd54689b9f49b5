package graft

import graft.operators.EventWindows
import graft.streaming.EventStreamJob
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** Executes the Structured Streaming surface (SURVEY.md §2.8) with
  * `Trigger.AvailableNow` (the reference's cron-batch model) and a memory
  * sink: the streaming tumbling aggregation must equal its batch face, and
  * `dropDuplicatesWithinWatermark` must behave as streaming insert-ignore.
  */
class EventStreamSpec extends SparkSpecBase {
  import spark.implicits._

  /** File-stream sources need a directory; stage the events parquet into one. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming tumblingAgg (AvailableNow) equals batch tumblingDaily") {
    val stream = EventStreamJob.tumblingAgg(
      EventStreamJob.readEventStream(spark, eventsDir))
    EventStreamJob.runAvailableNow(stream, "tum_stream", "complete").stop()

    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, Double)] =
      df.select(
        date_format(col("day_start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n").cast("long"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet

    val streamed = canon(spark.table("tum_stream"))
    val batch = canon(EventWindows.tumblingDaily(spark, Sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark is the streaming insert-ignore (A1)") {
    // duplicated event_ids across a small batch, raw nanos like the real table
    val base = 1700000000000000000L // nanos
    val rows = Seq(
      (1L, base, 10L, "click", 1.0, """{"k":1}"""),
      (1L, base + 60L * 1000000000L, 10L, "click", 1.0, """{"k":1}"""), // dup id
      (2L, base + 2L * 1000000000L, 11L, "view", 2.0, """{"k":2}"""),
      (3L, base + 3L * 1000000000L, 10L, "click", 3.0, """{"k":3}"""),
      (2L, base + 4L * 1000000000L, 11L, "view", 2.5, """{"k":4}""")) // dup id
    val dir = Files.createTempDirectory("graft_dedup_stream")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val deduped = EventStreamJob.dedupStream(
      EventStreamJob.readEventStream(spark, dir.toString))
    EventStreamJob.runAvailableNow(deduped, "dedup_stream", "append").stop()

    val ids = spark.table("dedup_stream").select("event_id").as[Long].collect()
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), "exactly one row per event_id")
  }
}
