package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Corpus-scaled LSH plane count: the formula's boundaries and the bucket
  * refinement property that makes growing the count safe.
  */
class LshPlanesSpec extends SparkSpecBase {

  test("planesFor: floor at driver SFs, log-growth past it, hard ceiling") {
    // every driver scale factor (≤2k vectors) keeps the historical 8 planes,
    // so the plane change is invisible to the sf0.01 correctness gate
    assert(Similarity.planesFor(1) == 8)
    assert(Similarity.planesFor(500) == 8)
    assert(Similarity.planesFor(2000) == 8)
    // exact power-of-two boundary: 2048 vectors fill 256 buckets at 8 each;
    // one more vector needs the 9th plane
    assert(Similarity.planesFor(2048) == 8)
    assert(Similarity.planesFor(2049) == 9)
    // 30× replica of sf0.1 (60k vectors) → 13 planes / 8192 buckets
    assert(Similarity.planesFor(60000) == 13)
    // occupancy stays ~LshTargetBucket as N grows: buckets ≥ N/target
    for (n <- Seq(100000L, 10000000L, 1000000000L)) {
      val buckets = 1L << Similarity.planesFor(n)
      assert(buckets * Similarity.LshTargetBucket >= n, s"n=$n")
    }
    assert(Similarity.planesFor(Long.MaxValue) == Similarity.LshMaxPlanes)
  }

  test("buckets refine: low bits of a wider bucket are the narrower bucket") {
    // plane p's hyperplane depends only on (p, dim), never on the total
    // count, and the bucket id sets bit p per plane — so the 8-plane bucket
    // is literally the low 8 bits of the 12-plane bucket. This is what makes
    // the corpus-scaled count safe: growing it only splits buckets, never
    // reshuffles vectors across unrelated ones.
    val e = Tables.embeddings(spark, Sf)
    val df = e.select(
      Similarity.lshBucket(col("embedding"), 8).as("b8"),
      Similarity.lshBucket(col("embedding"), 12).as("b12"))
    assert(df.filter(col("b12").bitwiseAND(lit(255L)) =!= col("b8")).isEmpty)
  }
}
