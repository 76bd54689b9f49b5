package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Spherical k-means coarse-quantizer training: shape, determinism, and the
  * fit actually improving the quantization objective over the untrained init.
  */
class IvfTrainingSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, Sf)

  /** Mean best-cell cosine over all vectors — the IVF quantization objective
    * (higher = vectors sit closer to their assigned centroid).
    */
  private def objective(cents: Array[Array[Double]]): Double = {
    val centsLit = array(cents.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    emb.select(col("vec_id"), col("embedding"), posexplode(centsLit))
      .withColumn("ccos", Similarity.dot(col("embedding"), col("col")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("col"))))
      .groupBy(col("vec_id")).agg(max(col("ccos")).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)
  }

  test("returns nlist centroids of the embedding dimension") {
    val cents = Similarity.trainIvfCentroids(emb, nlist = 8, iters = 1)
    assert(cents.length == 8)
    assert(cents.forall(_.length == Similarity.Dims))
  }

  test("training is deterministic run-to-run") {
    val a = Similarity.trainIvfCentroids(emb, nlist = 4, iters = 2)
    val b = Similarity.trainIvfCentroids(emb, nlist = 4, iters = 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("fitted centroids beat the first-nlist-vectors quantizer") {
    val init = emb.orderBy(col("vec_id")).limit(Similarity.IvfCentroids)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val trained = Similarity.trainIvfCentroids(emb, Similarity.IvfCentroids, iters = 3)
    val (o0, o1) = (objective(init), objective(trained))
    assert(o1 > o0, f"objective did not improve: init $o0%.4f trained $o1%.4f")
  }

  test("trained IVF search returns k ranked neighbors per probe") {
    val out = Similarity.ivfTopKTrained(spark, Sf)
    val byQuery = out.groupBy(col("query_id")).agg(count(lit(1)).as("n"),
      max(col("rnk")).as("maxr")).collect()
    assert(byQuery.length == 10)
    assert(byQuery.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
  }
}
