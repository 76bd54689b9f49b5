package graft

import graft.operators.{Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hybrid RRF retrieval (operators/Retrieval.scala): the fusion algebra is
  * pinned independently of the oracle — RRF scores recompute exactly from
  * the emitted integer ranks, each arm's ranks agree with the arm run
  * standalone, both-arm docs beat either single-arm contribution, the batch
  * face equals the single face run per query, and the doc_id/vec_id
  * correspondence the fusion relies on holds in the fixture (r11 ADVICE).
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

  test("lexical ranks agree with the BM25 arm run standalone (query doc excluded)") {
    // mirror of the face's exclusion: top armK+1, drop the query's own doc,
    // rank the survivors
    val lexTop = TextAnalysis.bm25Search(spark, Sf, Seq("vector", "merge"), 51)
      .filter(col("doc_id") =!= Retrieval.DefaultQueryVecId)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().take(50).map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    fused.filter(_.getAs[Long]("lex_rank") > 0).foreach { r =>
      assert(lexTop(r.getAs[Long]("doc_id")) === r.getAs[Long]("lex_rank"))
    }
  }

  test("neither arm (and no fused row) ever returns the query's own document") {
    assert(!fused.exists(_.getAs[Long]("doc_id") == Retrieval.DefaultQueryVecId))
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

  test("doc_id/vec_id index the same corpus (the fusion's identity contract)") {
    val docIds = Tables.documents(spark, Sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val vecIds = Tables.embeddings(spark, Sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(docIds === vecIds,
      "embeddings.vec_id must be exactly documents.doc_id — the hybrid " +
        "fusion joins the two arms on that identity")
  }

  test("batch face equals the single-query face run once per query") {
    val queries = Retrieval.BatchQueries.take(3)
    val (armK, k) = (20, 5)
    val batch = Retrieval.hybridRrfBatch(spark, Sf, queries, armK, k)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("lex_rank"), r.getAs[Long]("vec_rank"),
        r.getAs[Double]("rrf"))).toSeq.sorted).toMap
    queries.foreach { case (qid, terms) =>
      val single = Retrieval.hybridRrf(spark, Sf, terms, qid, armK, k)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("lex_rank"), r.getAs[Long]("vec_rank"),
          r.getAs[Double]("rrf"))).toSeq.sorted
      assert(batch(qid) === single,
        s"batch result for query $qid diverges from the single face")
    }
  }
}
