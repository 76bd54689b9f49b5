package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. Extends the reference's PK insert-ignore dedup
  * (`posts_pipeline.py:57`, first-writer-wins per id) to content-level dedup,
  * the core operation of a training-data pipeline.
  *
  * Cross-engine determinism: every hash is derived from md5 (bit-identical in
  * Spark and DuckDB) rather than engine-private hashes (xxhash64/murmur), so
  * even the MinHash signatures — and therefore the LSH candidate sets — are
  * reproducible by the DuckDB oracle exactly.
  *
  * Scale shape: signature computation is embarrassingly parallel per row
  * (higher-order array expressions, no shuffle); the LSH self-join shuffles on
  * (band, bandKey) — tiny keys, heavily reduced data — instead of the O(n²)
  * all-pairs join a naive design would need.
  */
object Dedup {

  /** 60-bit hash from md5 — identical in DuckDB as
    * `CAST(concat('0x', substring(md5(s || '#' || k), 1, 15)) AS BIGINT)`.
    */
  def md5Hash60(s: Column, seed: Column): Column =
    conv(substring(md5(concat(s, lit("#"), seed.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Word 3-shingles (distinct) of a text column; docs with <3 tokens drop. */
  def shingles3(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
      concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
  }

  val NumHashes = 16
  val Bands = 8 // 2 rows per band → LSH threshold ≈ (1/8)^(1/2) ≈ 0.35

  /** Per-doc MinHash signature: for each of 16 seeds, the min hash over the
    * shingle set. One narrow projection — no shuffle.
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles3(col("text")).as("sset"))
      .filter(size(col("sset")) > 0)
      .withColumn("sig", transform(sequence(lit(0), lit(NumHashes - 1)), k =>
        array_min(transform(col("sset"), sh => md5Hash60(sh, k)))))

  /** MinHash+LSH near-duplicate pairs: band the signature (8 bands × 2 rows),
    * self-join on band key for candidates, then verify with exact Jaccard on
    * the shingle sets. Output: pairs with exact Jaccard ≥ 0.35.
    */
  def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    val sig = minhashSignatures(s, d)
    val banded = sig.select(
      col("doc_id"), col("sset"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        md5(concat_ws(",",
          element_at(col("sig"), b * 2 + 1).cast("string"),
          element_at(col("sig"), b * 2 + 2).cast("string"))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("sset").as("set_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("sset").as("set_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b")))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= 0.35)
  }

  /** Exact n-gram (3-shingle) Jaccard similarity, blocked by language and a
    * ±20% token-count band (a standard sound prefilter: |A∩B|/|A∪B| ≥ t needs
    * |A|/|B| ≥ t, so distant lengths can't pass the threshold). All-pairs
    * within blocks — the exact ground-truth counterpart of the LSH variant.
    */
  def ngramJaccardPairs(s: SparkSession, d: String, threshold: Double = 0.2): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), shingles3(col("text")).as("sset"))
      .filter(size(col("sset")) > 0)
      .withColumn("n", size(col("sset")))
    val a = base.select(col("lang"), col("doc_id").as("doc_a"),
      col("sset").as("set_a"), col("n").as("n_a"))
    val b = base.select(col("lang"), col("doc_id").as("doc_b"),
      col("sset").as("set_b"), col("n").as("n_b"))
    a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_a") * 5 >= col("n_b") * 4 && col("n_b") * 5 >= col("n_a") * 4)
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val SimHashBits = 60

  /** SimHash fingerprint (60-bit, md5-derived token hashes, emitted as a
    * bit-string so the oracle avoids 64-bit shift overflow). Majority vote per
    * bit over the distinct token set.
    */
  def simhashBits(text: Column): Column = {
    val th = transform(array_distinct(TextAnalysis.tokens(text)), t => md5Hash60(t, lit(0)))
    val n = size(th)
    val bits = (SimHashBits - 1 to 0 by -1).map { bitPos =>
      val ones = size(filter(th, h => h.bitwiseAND(lit(1L << bitPos)) =!= 0L))
      when(ones * 2 > n, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  def simhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), simhashBits(col("text")).as("simhash"))

  /** SimHash near-duplicate pairs: block on 4 substrings of 15 bits (any
    * identical quarter makes a candidate — guarantees recall for hamming ≤ 3
    * by pigeonhole), then verify exact hamming ≤ maxHamming.
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    val sh = simhash(s, d)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        substring(col("simhash"), q * 15 + 1, 15)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", expr(
        s"size(filter(sequence(1, $SimHashBits), i -> substring(sim_a, i, 1) <> substring(sim_b, i, 1)))"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact dedup: one survivor (min doc_id) per normalized-content
    * fingerprint. At 100 TB this is a single hash-shuffle on a 32-char key —
    * the md5 projection keeps the shuffle narrow (no full text movement).
    */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("fingerprint"), col("n_copies"))
}
