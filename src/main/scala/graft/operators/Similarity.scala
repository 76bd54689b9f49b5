package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Float math is kept bit-reproducible against the DuckDB oracle: elements are
  * cast to double and accumulated with a left fold (`aggregate` here,
  * `list_reduce` there — both strict left folds, and `0.0 + x == x` in IEEE),
  * so dot products, norms and cosines are identical doubles in both engines.
  *
  * Scale shape: the query side is broadcast (top-k probes are few); the corpus
  * side streams partition-parallel with no shuffle until the final per-query
  * top-k (`Window` over query_id — k rows per query survive). The LSH variant
  * buckets the corpus by sign-random-projection so each probe only scans its
  * bucket — the 100 TB path where brute force would scan everything.
  */
object Similarity {

  /** Left-fold sum of an array<double> column, starting at 0.0. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k: queries = vec_id < 10, corpus = all
    * vectors (self excluded). Baseline for the ANN variants.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }

  val LshPlanes = 8

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-1, 1). Reproducible in SQL, no RNG state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (Dedup.md5Hash60(concat(lit(s"plane$plane~"), dim.cast("string")), lit(0))
      .cast("double") / lit((1L << 59).toDouble)) - 1.0

  /** Sign-random-projection bucket id (8 bits) for an embedding column. */
  def lshBucket(vec: Column): Column = {
    val bits = (0 until LshPlanes).map { p =>
      val proj = foldSum(zip_with(vec, sequence(lit(0), lit(63)),
        (x, i) => x.cast("double") * planeComponent(p, i)))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: probes only scan their own bucket, then exact cosine
    * rerank within the bucket. Approximate (recall < 1 across bucket
    * boundaries) — the scale path; oracle-checked exactly because the buckets
    * are md5-deterministic in both engines.
    */
  def lshTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding")))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("bucket"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nvec"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs within an LSH bucket
    * with cosine above threshold (doc-level near-dup by vector similarity).
    */
  def embeddingNearDupPairs(s: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding")))
    val a = emb.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }
}
