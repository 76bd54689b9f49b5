package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** Pins [[Scd.scd2Merge]] semantics on a handcrafted dimension: change,
  * no-change, new-key, NULL-transition, history pass-through, and the
  * idempotent re-merge contract.
  */
class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2Merge: close+reopen changed, keep unchanged, open new, pass history") {
    val current = Seq(
      // key 1: will change segment
      (1L, "alice", "AUTO", ts("1990-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true),
      // key 1's already-closed history row must pass through untouched
      (1L, "alice", "OLD", ts("1980-01-01 00:00:00"), ts("1990-01-01 00:00:00"), false),
      // key 2: unchanged
      (2L, "bob", "BIKE", ts("1990-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true),
      // key 3: open row with NULL attr — incoming non-null must count as change
      (3L, "carol", null.asInstanceOf[String], ts("1990-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true))
      .toDF("k", "name", "seg", "valid_from", "valid_to", "is_current")
      .withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
      .withColumn("valid_to", col("valid_to").cast("timestamp_ntz"))
    val eff = ts("1996-06-01 00:00:00")
    val incoming = Seq(
      (1L, "alice", "TRUCK"), // changed
      (2L, "bob", "BIKE"),    // identical → no-op
      (3L, "carol", "BOAT"),  // NULL → value transition
      (9L, "zoe", "SHIP"))    // brand-new key
      .toDF("k", "name", "seg")
      .withColumn("eff", lit(eff).cast("timestamp_ntz"))

    val out = Scd.scd2Merge(current, incoming, "k", Seq("name", "seg"), "eff")
    val rows = out.select(col("k"), col("name"), col("seg"),
      col("valid_from").cast("timestamp"), col("valid_to").cast("timestamp"),
      col("is_current"))
      .as[(Long, String, String, java.sql.Timestamp, java.sql.Timestamp, Boolean)]
      .collect().toSet

    val e1990 = ts("1990-01-01 00:00:00")
    assert(rows == Set(
      (1L, "alice", "OLD", ts("1980-01-01 00:00:00"), e1990, false), // history
      (1L, "alice", "AUTO", e1990, eff, false),                      // closed
      (1L, "alice", "TRUCK", eff, null, true),                       // reopened
      (2L, "bob", "BIKE", e1990, null, true),                        // unchanged
      (3L, "carol", null, e1990, eff, false),                        // null→value closes
      (3L, "carol", "BOAT", eff, null, true),
      (9L, "zoe", "SHIP", eff, null, true)))                         // new key

    // idempotency: re-merging the same batch changes nothing — every
    // incoming row now equals its open version
    val again = Scd.scd2Merge(out, incoming, "k", Seq("name", "seg"), "eff")
    assert(again.count() == out.count())
    assert(again.filter(col("is_current")).count() == out.filter(col("is_current")).count())
  }

  test("q_scd2_customers: exactly one open row per live key, versions do not overlap") {
    val out = SparkEntry.queries("q_scd2_customers")(spark, Sf)
    val perKey = out.filter(col("is_current"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 1)
    assert(perKey.isEmpty, "every key must have exactly one open version")
    // closed versions end exactly where their successor starts
    val bad = out.as("a").join(out.as("b"),
      col("a.c_custkey") === col("b.c_custkey") &&
        !col("a.is_current") && col("b.is_current") &&
        col("a.valid_to") =!= col("b.valid_from"))
    assert(bad.isEmpty, "version chain must be gap-free")
  }
}
