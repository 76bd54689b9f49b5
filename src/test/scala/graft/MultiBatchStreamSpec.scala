package graft

import graft.streaming.EventStreamJob
import org.apache.spark.sql.functions._

/** The adversarial face of the streaming suite (r6 verdict task 2): every
  * landing is staged as [[SparkEntry.StreamSlices]] time-ordered files and
  * consumed with `maxFilesPerTrigger=1`, so the equivalences hold under REAL
  * multi-batch execution — per-batch watermark advance, state eviction, and
  * cross-batch state handoff — not the single-batch easy case.
  */
class MultiBatchStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def raw = Tables.table(spark, Sf, "events")

  test("tumbling agg settles to the batch face across K slice batches + sentinel flush") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mb_tum")
    val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
    def sentinel(days: Long) = spark.range(1).select(lit(-1L).as("event_id"),
      lit(maxTs + days * 86400L * 1000000000L).as("ts"), lit(0L).as("user_id"),
      lit("sentinel").as("event_type"), lit(0.0).as("value"),
      lit(null).cast("string").as("props"))
    SparkEntry.stageEventSlices(spark, Sf, dir, SparkEntry.StreamSlices,
      extraLast = Seq(sentinel(2), sentinel(3)))
    val q = EventStreamJob.runAvailableNow(
      EventStreamJob.tumblingAgg(EventStreamJob.readEventStream(
        spark, dir.toString, maxFilesPerTrigger = Some(1))),
      "mb_tum", "append")
    // the staging must actually have produced one batch per staged file —
    // this is the assertion that kills any single-batch regression
    assert(q.recentProgress.length >= SparkEntry.StreamSlices + 2,
      s"expected >= ${SparkEntry.StreamSlices + 2} batches, " +
        s"got ${q.recentProgress.length}")
    // watermark must have marched batch over batch, not jumped once
    val wms = q.recentProgress.map(_.eventTime.get("watermark")).filter(_ != null).distinct
    assert(wms.length >= 3, s"watermark never advanced per-batch: ${wms.toSeq}")
    q.stop()

    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, Double)] =
      df.select(date_format(col("day_start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n").cast("long"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
    val streamed = canon(
      spark.table("mb_tum").filter(col("event_type") =!= "sentinel"))
    val batch = canon(graft.operators.EventWindows.tumblingDaily(spark, Sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    spark.catalog.dropTempView("mb_tum")
  }

  test("cross-batch duplicates (within the watermark delay) are absorbed by state") {
    // dupWithinFile doubles every event in its own batch; overlapDupHours
    // REPLAYS the previous slice's last hour one batch later — those rows
    // can only be deduped by the operator's cross-batch key state
    val dir = java.nio.file.Files.createTempDirectory("graft_mb_dedup")
    SparkEntry.stageEventSlices(spark, Sf, dir, SparkEntry.StreamSlices,
      dupWithinFile = true, overlapDupHours = 1.0)
    val q = EventStreamJob.runAvailableNow(
      EventStreamJob.dedupStream(EventStreamJob.readEventStream(
        spark, dir.toString, maxFilesPerTrigger = Some(1)))
        .select(col("event_id")),
      "mb_dedup", "append")
    assert(q.recentProgress.length >= SparkEntry.StreamSlices)
    q.stop()
    val got = spark.table("mb_dedup").count()
    val distinctIds = raw.select("event_id").distinct().count()
    assert(got == distinctIds, s"expected $distinctIds distinct events, got $got")
    spark.catalog.dropTempView("mb_dedup")
  }

  test("sessions spanning slice boundaries continue from state; timeouts close the rest") {
    val streamed = SparkEntry.queries("q_stream_sessions")(spark, Sf)
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long, Double)] =
      df.select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        col("n_events").cast("long"), col("sum_value"))
        .as[(Long, String, String, Long, Double)].collect().toSet
    val got = canon(streamed)
    val batch = canon(graft.operators.EventWindows.sessionize(spark, Sf))
    assert(got == batch,
      "multi-batch fMGWS sessions must equal the batch session set")
    assert(got.nonEmpty)
  }

  test("stream-stream join matches purchases to views held in earlier-batch state") {
    val streamed = SparkEntry.queries("q_stream_join")(spark, Sf)
    val batch = EventStreamJob.purchaseViewJoinStream(
      Tables.events(spark, Sf).withColumn("ts", col("ts").cast("timestamp")))
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("purchase_id"), col("view_id"), col("user_id"))
        .as[(Long, Long, Long)].collect().toSet
    val got = canon(streamed)
    assert(got == canon(batch))
    assert(got.nonEmpty)
  }
}
