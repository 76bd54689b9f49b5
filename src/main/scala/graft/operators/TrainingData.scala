package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs after cleaning
  * and dedup: deterministic dataset splitting and benchmark decontamination.
  * (The reference has no equivalent — this extends its ingest surface the
  * same way the dedup/similarity operators do.)
  *
  * Both are pure column-expression dataflows: md5-derived hashes (bit-equal
  * in DuckDB, so both are oracle-checked) and narrow long-keyed shuffles.
  */
object TrainingData {

  /** Deterministic train/val/test assignment by key hash — the standard way
    * to split a corpus so the assignment is (a) reproducible run-to-run,
    * (b) stable under corpus growth (a doc's split never depends on other
    * rows — no sampling, no ordering), and (c) join-free to audit.
    *
    * `u` = the doc's 60-bit md5 hash scaled to [0, 1); split boundaries are
    * cumulative fractions. Per-row projection only — no shuffle at any
    * scale.
    */
  def hashSplit(s: SparkSession, d: String,
      trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame = {
    val u = (Dedup.md5Hash60(col("doc_id").cast("string"), lit(0)).cast("double")
      / lit(1152921504606846976.0)) // 2^60, exactly representable
    Tables.documents(s, d).select(
      col("doc_id"),
      u.as("u"),
      when(u < trainFrac, lit("train"))
        .when(u < trainFrac + valFrac, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Benchmark decontamination: find training docs sharing at least one
    * word n-gram with the eval set — the overlap screen run before training
    * so eval numbers aren't inflated by leaked benchmark text. Emits, per
    * contaminated training doc, how many distinct n-grams leak and how many
    * eval docs they touch.
    *
    * Scale shape: each side explodes to DISTINCT per-doc gram HASHES (60-bit
    * md5 longs — the shuffle/broadcast carries narrow (long, long) rows, no
    * gram text). The eval side is benchmark-suite sized — tiny next to the
    * corpus — so it broadcasts; the training side streams partition-parallel
    * with no shuffle until the per-doc count aggregation. A hash collision
    * could flag a clean doc (1 in 2^60 per gram pair) — acceptable for a
    * screen whose hits get reviewed; exact-match verification would rejoin
    * the gram text for flagged docs only.
    */
  def contamination(s: SparkSession, d: String,
      evalMaxDocId: Long = 50, n: Int = 5): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= n)
    // n-gram hashes off the BOUND token column (a lambda re-evaluates
    // non-lambda subtrees per element — t must be an attribute, not the
    // tokenizer expression)
    val gramHashes = array_distinct(transform(
      sequence(lit(1), size(col("t")) - (n - 1)),
      i => Dedup.md5Hash60(
        concat_ws(" ", (0 until n).map(k => element_at(col("t"), i + k)): _*),
        lit(0))))
    val grams = docs.select(col("doc_id"), explode(gramHashes).as("gh"))
    val evalGrams = grams.filter(col("doc_id") < evalMaxDocId)
      .select(col("gh"), col("doc_id").as("eval_id"))
    val trainGrams = grams.filter(col("doc_id") >= evalMaxDocId)
    trainGrams.join(broadcast(evalGrams), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
