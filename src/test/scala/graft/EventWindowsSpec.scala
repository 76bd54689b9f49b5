package graft

import graft.operators.EventWindows
import org.apache.spark.sql.functions._

/** Batch time-series operators: gap-fill densification and the trailing
  * range-frame rolling aggregate. Value parity lives in the DuckDB oracles;
  * these pin the semantic contracts against independent reimplementations.
  */
class EventWindowsSpec extends SparkSpecBase {

  test("gapFillHourly emits a dense hourly spine per user, counts preserved") {
    val filled = EventWindows.gapFillHourly(spark, Sf).cache()
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
    // per user: rows == span hours + 1, total events preserved, no negatives
    val spans = ev.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))))
      .toMap
    val got = filled.groupBy("user_id")
      .agg(count(lit(1)).as("rows"), sum(col("n_events")).as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == spans.keySet)
    got.foreach { case (u, (rows, total)) =>
      val (h0, h1, n) = spans(u)
      val hours = (h1.getTime - h0.getTime) / 3600000L + 1
      assert(rows == hours, s"user $u: $rows rows for $hours-hour span")
      assert(total == n, s"user $u: gap-fill changed the event count")
    }
    // densification must actually add empty hours on this sparse data
    assert(filled.filter(col("n_events") === 0).count() > 0)
    filled.unpersist()
  }

  test("funnel counts only in-order stage progressions, lags exact") {
    import spark.implicits._
    // user 1: full in-order funnel (lags 10, 20, 30 us)
    // user 2: purchase BEFORE click — reaches view only
    // user 3: no signup — reaches nothing (later stages need stage 1)
    // user 4: signup then click (no view) — click must NOT count
    val ev = Seq(
      (1L, "signup", 100L), (1L, "view", 110L), (1L, "click", 130L), (1L, "purchase", 160L),
      (2L, "signup", 200L), (2L, "view", 210L), (2L, "purchase", 205L), (2L, "click", 260L),
      (3L, "view", 300L), (3L, "click", 310L), (3L, "purchase", 320L),
      (4L, "signup", 400L), (4L, "click", 410L)
    ).toDF("user_id", "event_type", "us")
    val got = EventWindows.funnelEvents(ev)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // user 2's click at 260 IS after its view at 210 — stage 3 counts users
    // 1 and 2; stage 4 needs a purchase after the click: only user 1.
    assert(got == Set(
      (1L, "signup", 3L, 0L),
      (2L, "view", 2L, 20L),      // lags: u1 110-100=10, u2 210-200=10
      (3L, "click", 2L, 70L),     // u1 130-110=20, u2 260-210=50
      (4L, "purchase", 1L, 30L))) // u1 160-130=30
  }

  test("rollingAnomalies flags only spikes against a settled trailing baseline") {
    import spark.implicits._
    // user 1: 24 alternating 10/12 events (σ≈1.03 trailing), then a 500
    //   spike (z≈476 → flagged), then an 11 whose frame CONTAINS the spike
    //   (σ huge → not flagged)
    // user 2: a wild spike after only 5 events → abstains (n < AnomalyMinN)
    // user 3: constant baseline then a spike → abstains (zero variance)
    val rows =
      (0 until 24).map(i => (100L + i, 1L, i.toLong * 60000000L,
        if (i % 2 == 0) 10.0 else 12.0)) ++
      Seq((124L, 1L, 24L * 60000000L, 500.0), (125L, 1L, 25L * 60000000L, 11.0)) ++
      (0 until 5).map(i => (200L + i, 2L, i.toLong * 60000000L, 10.0 + (i % 2))) ++
      Seq((205L, 2L, 5L * 60000000L, 999.0)) ++
      (0 until 15).map(i => (300L + i, 3L, i.toLong * 60000000L, 7.0)) ++
      Seq((315L, 3L, 15L * 60000000L, 100.0))
    val ev = rows.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventWindows.rollingAnomaliesFrame(ev, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == Set(124L), s"flagged: $got")
    assert(got(124L) > 3.0)
  }

  test("funnelWindowed: a stage landing past the bound breaks the chain there") {
    import spark.implicits._
    val H = 3600000000L
    // u1: all stages within bounds; u2: view 2h after signup -> chain stops
    // at signup even though later stages exist; u3: view in time, click
    // exactly AT the bound (inclusive), purchase 1us past it -> stops at click
    val ev = Seq(
      (1L, "signup", 0L), (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "signup", 0L), (2L, "view", 2 * H), (2L, "click", 2 * H + 1), (2L, "purchase", 2 * H + 2),
      (3L, "signup", 0L), (3L, "view", 50L), (3L, "click", 50L + H), (3L, "purchase", 50L + 2 * H + 1)
    ).toDF("user_id", "event_type", "us")
    val got = EventWindows.funnelWindowedEvents(ev, H)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "signup" -> ((3L, 0L)),
      "view" -> ((2L, 150L)),            // u1 100 + u3 50
      "click" -> ((2L, 100L + H)),       // u1 100, u3 exactly at bound
      "purchase" -> ((1L, 100L))), s"windowed funnel wrong: $got")
  }

  test("maxConcurrency: sweep-line max on handcrafted intervals, end-exclusive") {
    import spark.implicits._
    // [0,10) [2,8) [5,15) [10,20): peak 3 on [5,8); [0,10) ending at 10
    // must NOT overlap [10,20) starting there (end-exclusive tie order)
    val ses = Seq((0L, 10L), (2L, 8L), (5L, 15L), (10L, 20L))
      .toDF("s_us", "e_us")
      .select(timestamp_micros(col("s_us") * 1000000).as("session_start"),
        timestamp_micros(col("e_us") * 1000000).as("session_end"))
    val got = EventWindows.maxConcurrencyOver(ses).head()
    assert((got.getLong(0), got.getLong(1)) == ((4L, 3L)))
    // two back-to-back intervals: concurrency never exceeds 1
    val chain = Seq((0L, 10L), (10L, 20L)).toDF("s_us", "e_us")
      .select(timestamp_micros(col("s_us") * 1000000).as("session_start"),
        timestamp_micros(col("e_us") * 1000000).as("session_end"))
    val g2 = EventWindows.maxConcurrencyOver(chain).head()
    assert((g2.getLong(0), g2.getLong(1)) == ((2L, 1L)))
  }

  test("rollingHour matches a driver-side trailing-window reimplementation") {
    val got = EventWindows.rollingHour(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    val ev = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").cast("long").as("sec"),
        col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))
    val byUser = ev.groupBy(_._2)
    val expected = ev.map { case (id, u, sec, _) =>
      val frame = byUser(u).filter(e => e._3 >= sec - 3599 && e._3 <= sec)
      val sum = frame.map(_._4).reduce(_ add _)
      id -> ((frame.length.toLong, sum.doubleValue))
    }.toMap
    assert(got == expected)
    // every event counts itself
    assert(got.values.forall(_._1 >= 1))
  }
}
