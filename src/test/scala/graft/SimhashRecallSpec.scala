package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the MEASURED SimHash banding recall (q_simhash_recall /
  * [[Dedup.simhashRecall]]) to the pigeonhole guarantee — 4 disjoint
  * 15-bit quarters catch EVERY pair at hamming ≤ 3 — and exercises the
  * known miss mode (differing bits spread across all four quarters) on
  * fingerprints crafted at exact hamming distances, something no document
  * corpus can target precisely.
  *
  * Quarter layout (matches [[Dedup.simhashFingerprintPairs]]): quarter q
  * covers bits 59-15q .. 45-15q of the packed long.
  */
class SimhashRecallSpec extends SparkSpecBase {

  // one bit inside quarter q (bit 45-15q+7 = mid-quarter, any would do)
  private def qbit(q: Int): Long = 1L << (45 - 15 * q + 7)
  // extra distinct bits inside quarter q (offsets 0..n-1 from the quarter LSB)
  private def qbits(q: Int, n: Int): Long =
    (0 until n).map(i => 1L << (45 - 15 * q + i)).reduce(_ | _)

  test("banding catches hamming<=3 always; misses only all-quarters-touched spreads") {
    import spark.implicits._
    val base = 0x0AAAAAAAAAAAAAAL // 60-bit pattern, no quarter all-zero
    // (label, xor mask, expected caught)
    val cases = Seq(
      ("h1_one_quarter", qbits(0, 1), true), // hamming 1
      ("h3_one_quarter", qbits(1, 3), true), // hamming 3, single quarter
      ("h3_three_quarters", qbit(0) | qbit(1) | qbit(2), true), // q3 untouched
      ("h4_one_quarter", qbits(2, 4), true), // 3 quarters still equal
      ("h4_all_quarters", qbit(0) | qbit(1) | qbit(2) | qbit(3), false),
      ("h6_two_quarters", qbits(0, 3) | qbits(3, 3), true), // q1,q2 equal
      ("h6_all_quarters", qbits(0, 2) | qbits(1, 2) | qbit(2) | qbit(3), false))
    // separate each case pair into its own value neighborhood so cross-case
    // pairs sit at large hamming and never enter the <=6 output
    val fps = cases.zipWithIndex.flatMap { case ((_, mask, _), i) =>
      val shifted = base ^ (i.toLong * 0x41L << 22) // scatter cases apart
      Seq(shifted, shifted ^ mask)
    }.distinct
    val got = Dedup.simhashFingerprintPairs(
        fps.toDF("h"), maxHamming = 6, hotBandCap = Dedup.HotBandCap)
      .select(col("h_a"), col("h_b")).as[(Long, Long)].collect().toSet
    cases.zipWithIndex.foreach { case ((label, mask, expectCaught), i) =>
      val h = base ^ (i.toLong * 0x41L << 22)
      val pair = (math.min(h, h ^ mask), math.max(h, h ^ mask))
      assert(got.contains(pair) == expectCaught,
        s"$label: caught=${got.contains(pair)}, expected $expectCaught")
    }
  }

  test("driver corpus: recall 1.0 at hamming<=3; 4-6 measured and reported") {
    val rows = SparkEntry.queries("q_simhash_recall")(spark, Sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    info(s"recall per hamming: ${rows.toSeq.sortBy(_._1)}")
    rows.foreach { case (hd, (nTrue, nFound, recall)) =>
      assert(nFound <= nTrue, s"hamming $hd: found $nFound > true $nTrue")
      assert(recall >= 0.0 && recall <= 1.0)
      if (hd <= 3)
        assert(recall == 1.0, s"pigeonhole violated at hamming $hd: $recall")
    }
  }
}
