package graft

import graft.operators.Similarity

/** Pins the exact pruning rule of [[Similarity.semanticDedupFrame]]: a vector
  * is dropped iff ANY smaller-id vector in its cluster is at cosine ≥
  * threshold — including smaller-id vectors that were themselves dropped.
  * (SemDeDup's sequential greedy variant compares only against KEPT vectors;
  * the generated DuckDB oracle mirrors the relaxation implemented here, so
  * this spec is what keeps the scaladoc, the query, and the oracle aligned.)
  */
class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("drop-by-any-smaller-id: an already-dropped neighbor still drops you") {
    // chain geometry in one cluster: cos(v0,v1)=0.6, cos(v1,v2)=0.8,
    // cos(v0,v2)=0.0. Sequential-greedy would KEEP v2 (its only
    // over-threshold smaller-id neighbor, v1, was dropped); the implemented
    // single-pass relaxation drops v2 too.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.6f, 0.8f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupFrame(emb, Array(Array(1.0, 1.0, 0.0)), 0.5)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L))
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, false, false))
  }

  test("clustering is the blocking: near-identical vectors in different cells are both kept") {
    // v0 lands in cell 0, v1 in cell 1 (nearest-centroid, ties impossible
    // here); their mutual cosine ≈ 0.995 is far over threshold, but
    // cross-cluster pairs are never compared — both keep.
    val emb = Seq(
      (0L, Array(1.0f, 0.9f, 0.0f)),
      (1L, Array(0.9f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val out = Similarity.semanticDedupFrame(emb, cents, 0.5)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq((0L, 0L, true), (1L, 1L, true)))
  }

  test("equal-cosine assignment ties break to the lowest centroid id") {
    // duplicate centroids: every vector's ccos ties across both cells; the
    // max_by(struct(ccos, -centroid_id)) tiebreak must pick cell 0, matching
    // the oracle's ORDER BY ccos DESC, centroid_id
    val emb = Seq((0L, Array(1.0f, 0.0f)), (7L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0))
    val out = Similarity.semanticDedupFrame(emb, cents, 0.99)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq((0L, 0L, true), (7L, 0L, false)))
  }

  test("semanticContamination: sound hits, recall bounded by blocking, catches paraphrase class") {
    import org.apache.spark.sql.functions._
    val tau = 0.2
    val out = Similarity.semanticContamination(spark, Sf, threshold = tau).collect()
    assert(out.nonEmpty, "screen must flag something at test scale")
    // soundness: every reported row's stats match an exact brute-force
    // recompute of that training vector against the full eval set — the
    // blocking may MISS pairs (recall face: q_ann_recall) but every
    // reported (n_eval_hits, max_cosine, nearest_eval_id) must be a
    // subset-consistent truth
    val emb = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
    val evalV = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("eval_id"), col("embedding").as("qvec"))
    val brute = emb.filter(col("vec_id") >= 50)
      .join(broadcast(evalV))
      .withColumn("cosine",
        Similarity.dot(col("embedding"), col("qvec")) /
          (Similarity.norm(col("embedding")) * Similarity.norm(col("qvec"))))
      .filter(col("cosine") >= tau)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("bn"), max(col("cosine")).as("bmax"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val (bn, bmax) = brute(id)
      assert(r.getAs[Long]("n_eval_hits") <= bn,
        s"vec $id reports more hits than brute-force truth")
      assert(r.getAs[Double]("max_cosine") <= bmax + 1e-12)
      assert(r.getAs[Long]("nearest_eval_id") < 50L)
    }
    // the point of the face: embedding hits that the exact n-gram screen
    // (q_contamination) does NOT flag exist — the paraphrase class
    val ngramFlagged = graft.operators.TrainingData.contamination(spark, Sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.exists(r => !ngramFlagged.contains(r.getAs[Long]("vec_id"))),
      "every embedding hit was already n-gram-flagged — face adds nothing")
  }

  test("semanticContaminationRecall: bands partition truth, found is a subset, faces agree") {
    import org.apache.spark.sql.functions._
    val rec = Similarity.semanticContaminationRecall(spark, Sf).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      val (t, f) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_found"))
      assert(f <= t, s"found exceeds truth in ${r.getAs[String]("band")}")
      assert(math.abs(r.getAs[Double]("recall") - f.toDouble / t) < 1e-15)
    }
    // cross-face consistency: the recall face's found mass IS the screen's
    // verified pair mass (both read the same hits implementation)
    val screenPairs = Similarity.semanticContamination(spark, Sf)
      .agg(sum(col("n_eval_hits"))).collect()(0).getLong(0)
    assert(rec.map(_.getAs[Long]("n_found")).sum == screenPairs,
      "recall face and screen disagree on the blocked pair mass")
  }
}
