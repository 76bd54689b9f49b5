package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic range buckets — the structural cure for the exchange-reuse
  * hazard in split prefix-scan recipes ([[Analytics.globalRank]],
  * [[Analytics.skyline]], [[EventWindows.maxConcurrencyOver]]).
  *
  * Those recipes decompose a global ordered scan into (a) a within-group
  * prefix aggregate and (b) a groups-sized cross-group offset/prefix term,
  * then join the two. Through round 9 the group was the PHYSICAL partition
  * (`spark_partition_id()` after `repartitionByRange`), which is correct
  * only while both consumers observe the SAME materialized exchange:
  * `RangePartitioning` samples its boundaries per execution, so if
  * `ReusedExchange` ever failed to kick in (AQE re-planning, conf drift),
  * the two subplans could shuffle against DIFFERENT boundaries and join
  * rows to the wrong offsets — silently. The r9 verdict flagged this as the
  * one latent plan-shape hazard in the repo.
  *
  * The fix: make the group a PURE FUNCTION OF THE ROW. Bucket cut points
  * are computed once on the driver and baked into the plan as literals, so
  * every consumer — however many times Catalyst re-executes or
  * re-partitions the subtree — assigns the identical bucket to the
  * identical row. `spark_partition_id()` disappears from correctness paths
  * entirely; the decomposition (associative prefix op ⊕ bucket offsets) is
  * exact for ANY cut placement that is monotone in the total order, which
  * any sorted cut list is by construction.
  *
  * Skew (r10 → r11): cuts were equi-width over driver [min, max], which
  * degrades to slow-not-wrong on pathological value distributions (one hot
  * bucket swallows the data). They are now EXACT QUANTILES OF A
  * DETERMINISTIC VALUE-HASH SAMPLE: a row survives iff
  * `xxhash64(seed, key) % denom == 0` — a pure function of the key value,
  * so the surviving multiset (and therefore the cut list) is identical
  * under any partitioning, task order, or re-execution, which is what the
  * cross-partition-count determinism sweep requires and what
  * `df.sample`/`approxQuantile` cannot promise. The sample is
  * frequency-weighted (every duplicate row of a surviving value survives),
  * so cuts land at equal-POPULATION boundaries and a log-skewed key still
  * fills buckets evenly (RangeBucketsSpec pins this). Correctness never
  * depends on the sample: a thin or empty sample only coarsens buckets.
  *
  * Cost: one column-pruned count + one column-pruned filtered scan
  * collecting ~`targetSample` doubles — same cost class as the min/max
  * pass it replaces; at warehouse scale both are footer-cheap relative to
  * the shuffles they gate.
  */
private[graft] object RangeBuckets {
  /** Bucket count for the split prefix-scan recipes: 2× the shuffle
    * partition count so hash placement of buckets onto partitions stays
    * balanced (64 balls into 32 bins). */
  val DefaultBuckets = 64

  private val CutSeed = 0x67726166745f7162L // "graft_qb"

  /** Sorted, strictly-increasing internal cut points (at most n−1) for
    * `key` — exact quantiles of the deterministic value-hash sample.
    * Empty array (single bucket, slow-not-wrong) on empty input or a
    * single-valued domain. `targetSample` bounds driver memory: the
    * keep-1-in-`denom` rate is derived from the non-null count so the
    * collected multiset is ~targetSample doubles at any data scale.
    */
  def cuts(df: DataFrame, key: Column, n: Int,
      targetSample: Int = 65536): Array[Double] = {
    val k = key.cast("double")
    val cnt = df.agg(count(k)).head().getLong(0)
    if (cnt == 0L) return Array.empty
    val denom = math.max(1L, cnt / targetSample)
    val sample = df.select(k.as("_k")).where(col("_k").isNotNull)
      .where(pmod(xxhash64(lit(CutSeed), col("_k")), lit(denom)) === 0)
      .collect().map(_.getDouble(0))
    java.util.Arrays.sort(sample)
    if (sample.isEmpty) return Array.empty
    // a cut at the sampled max would only create an empty top bucket, so
    // drop it — which also collapses single-valued domains to one bucket
    (1 until n).map { j =>
      sample(math.min(sample.length - 1, (j.toLong * sample.length / n).toInt))
    }.distinct.filter(_ < sample(sample.length - 1)).toArray
  }

  /** Monotone bucket id in [1, cuts.length + 1]: 1 + |{c ∈ cuts : c < key}|,
    * as one flat first-match-wins CASE over the descending cut literals
    * (codegen-friendly; ≤ 63 double compares per row at [[DefaultBuckets]]).
    * NULL keys fall through every predicate to bucket 1, matching Spark's
    * nulls-first ascending order.
    */
  def bucketByCuts(key: Column, cuts: Array[Double]): Column =
    if (cuts.isEmpty) lit(1L)
    else {
      val k = key.cast("double")
      val top = when(k > lit(cuts.last), lit(cuts.length + 1L))
      (cuts.length - 2 to 0 by -1)
        .foldLeft(top)((acc, i) => acc.when(k > lit(cuts(i)), lit(i + 2L)))
        .otherwise(lit(1L))
    }
}
