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
