package graft

import graft.functions.TopKAggregator
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The bounded-buffer typed Aggregator must produce exactly the rows the
  * window-based top-k produces (same ordering, same tie-breaks).
  */
class TopKAggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("Aggregator top-k equals the two-stage window top-k on real cosines") {
    val k = 5
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qvec"), col("nvec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))

    val agg = new TopKAggregator(k).toColumn
    val viaAggregator = scored
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, cos) => (id, cos) }
      .agg(agg.name("topk"))
      .flatMap { case (q, topk) =>
        topk.zipWithIndex.map { case ((id, cos), i) => (q, id, i + 1L, cos) }
      }
      .collect().toSet

    val viaWindow = Similarity.bruteForceTopK(spark, Sf, k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").cast("long"), col("cosine"))
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(viaAggregator == viaWindow)
    assert(viaAggregator.nonEmpty)
  }

  test("buffer never exceeds k and merge respects the tie-break order") {
    val k = 3
    val agg = new TopKAggregator(k)
    val buf = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == k)
    // 0.9 tie broken by smaller id first
    assert(agg.finish(buf) == Seq((2L, 0.9), (3L, 0.9), (5L, 0.7)))
    val merged = agg.merge(buf, List((0.95, 9L), (0.9, 1L)))
    assert(agg.finish(merged) == Seq((9L, 0.95), (1L, 0.9), (2L, 0.9)))
  }
}
