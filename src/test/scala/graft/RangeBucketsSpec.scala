package graft

import graft.operators.RangeBuckets
import org.apache.spark.sql.functions._

/** Deterministic sampled-quantile buckets: the structural-correctness
  * properties (pure-function-of-the-row assignment, monotone in the key,
  * identical cuts under any partitioning) plus the r11 skew upgrade —
  * a log-skewed key must still fill buckets near-evenly, where the old
  * equi-width boundaries collapsed almost everything into bucket 1.
  */
class RangeBucketsSpec extends SparkSpecBase {
  import spark.implicits._

  private val N = 16

  /** Log-skewed positive key: exp(13u) spans ~6 decades, so equi-width
    * over [min, max] puts ~99.99% of rows in the lowest bucket. */
  private def skewed(parts: Int) =
    spark.range(0, 20000, 1, parts)
      .select((exp(pmod(col("id") * 0.6180339887, lit(1.0)) * 13.0)).as("k"))

  test("cuts are identical across partition counts (pure function of the data)") {
    val a = RangeBuckets.cuts(skewed(32).toDF(), col("k"), N, targetSample = 2000)
    val b = RangeBuckets.cuts(skewed(13).toDF(), col("k"), N, targetSample = 2000)
    val c = RangeBuckets.cuts(skewed(1).toDF(), col("k"), N, targetSample = 2000)
    assert(a.toSeq == b.toSeq && b.toSeq == c.toSeq, "cuts depend on partitioning")
    assert(a.length > 1 && a.toSeq == a.sorted.toSeq && a.distinct.length == a.length,
      "cuts must be strictly increasing")
  }

  test("quantile cuts balance a log-skewed key that equi-width cannot") {
    val df = skewed(8).toDF()
    val cs = RangeBuckets.cuts(df, col("k"), N, targetSample = 4000)
    val pops = df.withColumn("b", RangeBuckets.bucketByCuts(col("k"), cs))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    val mean = 20000.0 / N
    assert(pops.values.max <= 3 * mean,
      s"hot bucket ${pops.values.max} rows vs mean $mean — skew not removed: $pops")
    // equi-width over the same domain for contrast: the lowest of 16
    // buckets swallows ~78% of rows (12x the mean) — the degradation the
    // quantile cuts remove
    val (lo, hi) = (math.exp(0.0), math.exp(13.0))
    val width = (hi - lo) / N
    val eqHot = df.filter(col("k") < lo + width).count()
    assert(eqHot > 15000, "fixture not actually skewed; tighten it")
  }

  test("bucket assignment is monotone in the key and total over nulls/extremes") {
    val cs = Array(10.0, 20.0, 30.0)
    val rows = Seq[Option[Double]](None, Some(-1e18), Some(5.0), Some(10.0), Some(10.5),
        Some(20.0), Some(25.0), Some(30.0), Some(31.0), Some(1e18))
      .toDF("k")
      .withColumn("b", RangeBuckets.bucketByCuts(col("k"), cs))
      .select("b").as[Long].collect().toSeq
    // 1 + |{c < k}|; k = cut value itself stays in the lower bucket; nulls -> 1
    assert(rows == Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
  }

  test("low-cardinality keys keep every value (rate from distinct count, not rows)") {
    // 60k rows over 100 distinct values: a ROW-count-derived sample rate
    // (60000/1000 = keep-1-in-60) would survive ~2 distinct values and
    // collapse the recipes to ~2 buckets (the l_shipdate-at-100x hazard);
    // the distinct-derived rate keeps all 100, giving the full cut set —
    // exact population quantiles
    val df = spark.range(0, 60000, 1, 16)
      .select((col("id") % 100).cast("double").as("k"))
    val cs = RangeBuckets.cuts(df, col("k"), N, targetSample = 1000)
    assert(cs.length == N - 1, s"expected ${N - 1} cuts, got ${cs.length}")
    val pops = df.withColumn("b", RangeBuckets.bucketByCuts(col("k"), cs))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(pops.size == N && pops.values.max <= 2 * (60000 / N),
      s"uniform low-cardinality key must fill all buckets: $pops")
  }

  test("a heavy-hitter value collects as ONE (value, freq) pair, cuts stay total") {
    // one value holds 50% of rows — the sample must not materialize its
    // multiplicity on the driver, and the cut walk must emit each value at
    // most once (strictly increasing cuts) with the hot value's weight
    // concentrated in one bucket
    val skew = spark.range(0, 40000, 1, 8)
      .select(when(col("id") % 2 === 0, lit(500.0))
        .otherwise((col("id") % 1000).cast("double")).as("k"))
    val cs = RangeBuckets.cuts(skew, col("k"), 8, targetSample = 100000)
    assert(cs.nonEmpty && cs.toSeq == cs.sorted.toSeq && cs.distinct.length == cs.length)
    val pops = skew.withColumn("b", RangeBuckets.bucketByCuts(col("k"), cs))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    // every non-hot bucket holds <= ~1/8 of the non-hot mass + slack; the
    // hot bucket is irreducibly ~50% (a single value cannot split)
    assert(pops.values.count(_ > 22000) <= 1, s"more than one hot bucket: $pops")
  }

  test("degenerate domains collapse to one bucket, never throw") {
    val one = Seq(7.0, 7.0, 7.0).toDF("k")
    assert(RangeBuckets.cuts(one, col("k"), N).isEmpty)
    val empty = Seq.empty[Double].toDF("k")
    assert(RangeBuckets.cuts(empty, col("k"), N).isEmpty)
    assert(one.withColumn("b", RangeBuckets.bucketByCuts(col("k"), Array.empty))
      .select("b").as[Long].collect().forall(_ == 1L))
  }
}
