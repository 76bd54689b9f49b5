package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
  * production search shape a RAG / training-data pipeline runs over a
  * corpus: a BM25 arm (term evidence) and an embedding-cosine arm (semantic
  * evidence), fused by RRF so neither arm's score scale has to be
  * calibrated against the other (rank is the only thing that crosses the
  * fusion boundary — the whole point of RRF and why it is the standard
  * baseline fusion in IR literature and production search stacks).
  *
  * Scale shape (100 TB): each arm is ONE pass over its table — the BM25 arm
  * is [[TextAnalysis.bm25Search]]'s term-partitioned posting-list shape; the
  * vector arm broadcasts a single query vector and scores map-side with the
  * codegen'd dot Expression, then a global `TakeOrderedAndProject` keeps
  * armK rows (no shuffle of the corpus, no pairwise join). Fusion itself
  * touches two ≤armK-row frames — driver-scale, whatever the corpus size.
  *
  * Determinism-for-oracle: fusion consumes INTEGER ranks only (scores never
  * cross the boundary), so the fused output is hash-stable as long as each
  * arm's rank order is — both arms carry a unique-id tiebreak, and the RRF
  * weight `1/(K+rank)` is one double division of exact small integers,
  * bit-identical across engines. Absent-arm membership is encoded as rank 0
  * (contributing 0.0) instead of NULL, so the rank columns stay int64 under
  * the dtype-strict oracle gate on both engines.
  */
object Retrieval {

  /** The canonical RRF dampening constant (k=60 in the original
    * Cormack/Clarke/Buettcher formulation — large enough that a handful of
    * rank-1 appearances cannot drown broad mid-rank agreement).
    */
  val RrfK: Int = 60

  def hybridRrf(s: SparkSession, d: String,
      terms: Seq[String] = Seq("vector", "merge"),
      queryVecId: Long = 0L, armK: Int = 50, k: Int = 10): DataFrame = {
    // lexical arm: BM25 top-armK; the rank window runs over the ≤armK-row
    // frame the limit already produced (bounded, single partition — same
    // precedent as the bucket-offset frames in Analytics/EventWindows)
    val lex = TextAnalysis.bm25Search(s, d, terms, armK)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))

    // vector arm: one broadcast query vector, map-side cosine, global top-k
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
      .withColumn("qn", Similarity.norm(col("qvec")))
    val vec = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        (Similarity.dot(col("qvec"), col("embedding")) /
          (col("qn") * Similarity.norm(col("embedding")))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id").asc)
      .limit(armK)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("cosine").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("vec_rank"))

    // fusion: full outer over the two tiny rank frames; a doc absent from
    // an arm carries rank 0 there and that arm contributes exactly 0.0
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf",
        when(col("lex_rank") > 0, lit(1.0) / (lit(RrfK) + col("lex_rank")))
          .otherwise(lit(0.0)) +
          when(col("vec_rank") > 0, lit(1.0) / (lit(RrfK) + col("vec_rank")))
            .otherwise(lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }
}
