package graft

import graft.operators.{Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hybrid RRF retrieval (operators/Retrieval.scala): the fusion algebra is
  * pinned independently of the oracle — RRF scores recompute exactly from
  * the emitted integer ranks, each arm's ranks agree with the arm run
  * standalone, and both-arm docs beat either single-arm contribution.
  */
class RetrievalSpec extends SparkSpecBase {

  private lazy val fused = Retrieval.hybridRrf(spark, Sf).collect()

  test("rrf recomputes exactly from the emitted integer ranks") {
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val lex = r.getAs[Long]("lex_rank")
      val vec = r.getAs[Long]("vec_rank")
      val expect =
        (if (lex > 0) 1.0 / (Retrieval.RrfK + lex) else 0.0) +
          (if (vec > 0) 1.0 / (Retrieval.RrfK + vec) else 0.0)
      assert(r.getAs[Double]("rrf") === expect)
      assert(lex >= 0L && lex <= 50L && vec >= 0L && vec <= 50L)
      assert(lex > 0L || vec > 0L, "a fused doc must appear in some arm")
    }
  }

  test("lexical ranks agree with the BM25 arm run standalone") {
    val lexTop = TextAnalysis.bm25Search(spark, Sf, Seq("vector", "merge"), 50)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    fused.filter(_.getAs[Long]("lex_rank") > 0).foreach { r =>
      assert(lexTop(r.getAs[Long]("doc_id")) === r.getAs[Long]("lex_rank"))
    }
  }

  test("vector ranks agree with the cosine arm recomputed directly") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
      .withColumn("qn", Similarity.norm(col("qvec")))
    val vecTop = emb.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (Similarity.dot(col("qvec"), col("embedding")) /
          (col("qn") * Similarity.norm(col("embedding")))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(50).collect().map(_.getAs[Long]("vec_id")).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    fused.filter(_.getAs[Long]("vec_rank") > 0).foreach { r =>
      assert(vecTop(r.getAs[Long]("doc_id")) === r.getAs[Long]("vec_rank"))
    }
  }

  test("fused order is rrf desc with doc_id tiebreak, at most k rows") {
    assert(fused.length <= 10)
    val keys = fused.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted))
  }
}
