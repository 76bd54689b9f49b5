package graft

import graft.operators.IngestTransforms
import org.apache.spark.sql.functions._

/** Contract of [[IngestTransforms.bloomInsertIgnore]]: bit-identical result
  * to the plain anti-join [[IngestTransforms.insertIgnore]] (the Bloom probe
  * is a pure pre-filter — no false negatives), while the sketch genuinely
  * prunes (a probe over absent keys rejects ≈ 1 − fpp of them).
  */
class BloomJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("result is identical to the plain anti-join on the orders shape") {
    val orders = Tables.orders(spark, Sf)
    val incoming = orders.filter(col("o_orderkey") % 2 === 1)
    val existing = orders.filter(col("o_orderkey") % 5 === 0)
    val bloom = IngestTransforms.bloomInsertIgnore(incoming, existing, "o_orderkey")
      .select("o_orderkey").as[Long].collect().sorted
    val plain = IngestTransforms.insertIgnore(incoming, existing, "o_orderkey")
      .select("o_orderkey").as[Long].collect().sorted
    assert(bloom.nonEmpty && bloom.sameElements(plain))
  }

  test("in-batch duplicates collapse and existing keys drop") {
    val incoming = Seq(1L, 2L, 2L, 3L, 4L).toDF("k")
    val existing = Seq(2L, 4L).toDF("k")
    val out = IngestTransforms.bloomInsertIgnore(incoming, existing, "k")
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("plan carries the Bloom probe (the semi-join reduction is real)") {
    // range inputs, not LocalRelation: Catalyst evaluates projections over
    // LocalRelation at optimize time, which would fold the probe into data
    val incoming = spark.range(100).select(col("id").as("k"))
    val existing = spark.range(0, 100, 3).select(col("id").as("k"))
    val sketch = Array.fill[Byte](16)(0)
    val batch = IngestTransforms.bloomDedupedBatch(incoming, "k", sketch)
    assert(batch.queryExecution.optimizedPlan.toString.contains("might_contain"))
    val out = IngestTransforms.bloomInsertIgnore(incoming, existing, "k")
    assert(out.queryExecution.optimizedPlan.toString.contains("might_contain"))
  }

  test("sketch sized from the build side rejects most absent keys") {
    val existing = spark.range(1000).select(col("id").as("k"))
    val nKeys = 1000L
    val nBits = math.ceil(-nKeys * math.log(0.03) / (math.log(2) * math.log(2))).toLong
    val sketch = existing
      .agg(call_function("graft_bloom_agg", xxhash64(col("k")), lit(nKeys), lit(nBits)))
      .head().getAs[Array[Byte]](0)
    // probe 10k keys guaranteed absent from the build range
    val absent = spark.range(1000000, 1010000).select(col("id").as("k"))
    val falsePositives = absent
      .filter(call_function("graft_bloom_might", lit(sketch), xxhash64(col("k"))))
      .count()
    // fpp target 3%; allow generous slack — the assertion is "the sketch
    // prunes", not a tight fpp bound
    assert(falsePositives < 1000, s"fp=$falsePositives of 10000")
    // and no false negatives: every built key must probe true
    val hits = existing
      .filter(call_function("graft_bloom_might", lit(sketch), xxhash64(col("k"))))
      .count()
    assert(hits == 1000L)
  }
}
