package graft

import graft.operators.{Dedup, EventWindows, IngestTransforms, Scd, ThreadGraph}
import org.apache.spark.sql.functions._

/** Degenerate-input contracts for the reusable operator cores: a LIBRARY
  * caller feeds these empty batches (a quiet ingest hour), single rows,
  * and no-op merges long before any scale problem — the operators must
  * return the structurally-correct empty/identity answer, not throw or
  * hang an iteration loop.
  */
class EdgeCaseSpec extends SparkSpecBase {
  import spark.implicits._

  private def emptyLike(cols: String*)(types: String*) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(cols.zip(types).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
      }))

  test("insertIgnore: empty batch appends nothing; empty target passes all") {
    val target = Seq((1L, "a")).toDF("id", "v")
    val empty = emptyLike("id", "v")("bigint", "string")
    assert(IngestTransforms.insertIgnore(empty, target, "id").isEmpty)
    val all = IngestTransforms.insertIgnore(target, empty, "id")
    assert(all.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("clusterLabels: empty pair list converges immediately to zero labels") {
    val empty = emptyLike("doc_a", "doc_b")("bigint", "bigint")
    assert(Dedup.clusterLabels(empty).isEmpty)
  }

  test("clusterLabels: a single self-contained pair labels both ends") {
    val one = Seq((5L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterLabels(one).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L))
  }

  test("simhash banding: empty and singleton fingerprint sets emit no pairs") {
    assert(Dedup.simhashFingerprintPairs(
      emptyLike("h")("bigint"), 6, Dedup.HotBandCap).isEmpty)
    assert(Dedup.simhashFingerprintPairs(
      Seq(42L).toDF("h"), 6, Dedup.HotBandCap).isEmpty)
  }

  test("scd2Merge: empty incoming batch is the identity on the dimension") {
    val current = Seq(
      (1L, "AUTO", java.sql.Timestamp.valueOf("1990-01-01 00:00:00"),
        null.asInstanceOf[java.sql.Timestamp], true))
      .toDF("k", "seg", "valid_from", "valid_to", "is_current")
      .withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
      .withColumn("valid_to", col("valid_to").cast("timestamp_ntz"))
    val incoming = emptyLike("k", "seg", "eff")("bigint", "string", "timestamp_ntz")
    val out = Scd.scd2Merge(current, incoming, "k", Seq("seg"), "eff")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(4)))
      .toSeq == Seq((1L, "AUTO", true)))
  }

  test("threadIndex: empty comments; a root-only row is its own depth-0 root") {
    val empty = emptyLike("id", "parent")("bigint", "bigint")
    assert(ThreadGraph.threadIndex(empty).isEmpty)
    // contract: roots carry parent NULL (ThreadGraph.scala:21)
    val root = Seq((3L, Option.empty[Long])).toDF("id", "parent")
    val got = ThreadGraph.threadIndex(root).collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L &&
      got.head.getLong(2) == 0L && got.head.getBoolean(3))
  }

  test("asOfJoin: empty sides follow the inner as-of contract (no-match rows drop)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = emptyLike("k", "rt", "tb", "v")("bigint", "bigint", "bigint", "string")
    // inner as-of semantics: a left row with no at-or-before match DROPS
    assert(graft.operators.TemporalJoins
      .asOfJoin(left, right, Seq("k"), "t", "rt", "tb", Seq("v")).isEmpty)
    // and an empty LEFT produces nothing, regardless of right content
    val r2 = Seq((1L, 5L, 0L, "x")).toDF("k", "rt", "tb", "v")
    assert(graft.operators.TemporalJoins
      .asOfJoin(emptyLike("k", "t")("bigint", "bigint"), r2,
        Seq("k"), "t", "rt", "tb", Seq("v")).isEmpty)
  }

  test("funnelEvents: empty input and no-signup corpora reach zero at every stage") {
    val empty = emptyLike("user_id", "event_type", "us")("bigint", "string", "bigint")
    assert(EventWindows.funnelEvents(empty)
      .collect().forall(_.getLong(2) == 0L))
    val noSignup = Seq((1L, "view", 10L), (1L, "click", 20L))
      .toDF("user_id", "event_type", "us")
    assert(EventWindows.funnelEvents(noSignup)
      .collect().forall(_.getLong(2) == 0L))
  }

  test("maxConcurrencyOver: empty intervals yield zero sessions, null-free max") {
    val empty = emptyLike("session_start", "session_end")("timestamp", "timestamp")
    val got = EventWindows.maxConcurrencyOver(empty).head()
    assert(got.getLong(0) == 0L)
    // max over zero points is NULL — the honest empty answer (a caller
    // coalesces to 0 if it wants a number); it must not throw
    assert(got.isNullAt(1))
  }

  test("rollingAnomaliesFrame: empty events and all-abstain series emit no rows") {
    val empty = emptyLike("event_id", "user_id", "ts", "value")(
      "bigint", "bigint", "timestamp", "double")
    assert(EventWindows.rollingAnomaliesFrame(empty, 3).isEmpty)
    val tiny = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 1L, 99.0))
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(EventWindows.rollingAnomaliesFrame(tiny, 3).isEmpty)
  }

  test("semanticContaminationSweep: an empty eval set yields empty truth, no crash") {
    import graft.operators.Similarity
    // evalMaxVecId = 0 -> no eval vectors, no probes, no truth pairs; the
    // sweep must plan and execute to an empty frame, not blow up on an
    // empty broadcast side or a null aggregate
    assert(Similarity.semanticContaminationSweep(spark, Sf, evalMaxVecId = 0)
      .isEmpty)
  }

  test("coOrderHeavyTopK: a candidate pool of zero returns the typed empty frame") {
    import graft.operators.Graphs
    val out = Graphs.coOrderHeavyTopK(spark, Sf, candidates = 0)
    assert(out.isEmpty)
    assert(out.columns.toSeq === Seq("u", "v", "n_orders"),
      "empty result must keep the face's schema")
  }

  test("contaminationClosure: an eval horizon beyond the corpus removes nothing") {
    import graft.operators.TrainingData
    // every doc is "eval" -> no training docs to flag; empty, not an error
    assert(TrainingData.contaminationClosure(spark, Sf,
      evalMaxDocId = Long.MaxValue).isEmpty)
  }
}
