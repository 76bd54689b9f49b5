package graft

import graft.operators.{TextAnalysis, TrainingData}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators: deterministic hash split, decontamination
  * screen, repetition scoring. The exact value checks live in the DuckDB
  * oracle; these are the structural contracts.
  */
class TrainingDataSpec extends SparkSpecBase {

  test("hashSplit assigns every doc exactly once, deterministically") {
    val a = TrainingData.hashSplit(spark, Sf).cache()
    val total = Tables.documents(spark, Sf).count()
    assert(a.count() == total)                       // no doc lost or duplicated
    assert(a.select("doc_id").distinct().count() == total)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 90/5/5 within generous tolerance at 500 docs (hash uniformity)
    assert(counts.getOrElse("train", 0L).toDouble / total > 0.8, s"$counts")
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val b = TrainingData.hashSplit(spark, Sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty) // run-to-run identical
    a.unpersist()
  }

  test("contamination flags only training docs that share grams with eval") {
    val c = TrainingData.contamination(spark, Sf).cache()
    val rows = c.collect()
    assert(rows.nonEmpty, "synthetic corpus has heavy 5-gram overlap; expected hits")
    assert(rows.forall(_.getLong(0) >= 50), "eval docs must never be flagged")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(2) >= 1))
    // spot-check one flagged doc by brute force on the raw text
    val flagged = rows.map(_.getLong(0)).min
    def grams(id: Long): Set[Seq[String]] =
      Tables.documents(spark, Sf).filter(col("doc_id") === id)
        .select(TextAnalysis.tokens(col("text"))).collect()
        .headOption.map(_.getSeq[String](0).sliding(5).filter(_.size == 5).toSet)
        .getOrElse(Set.empty)
    val evalGrams = (0L until 50L).flatMap(grams).toSet
    assert(grams(flagged).exists(evalGrams.contains),
      s"doc $flagged flagged but shares no 5-gram with eval set")
    c.unpersist()
  }

  test("repetitionScore ratios are in [0,1] and consistent with token counts") {
    val r = TextAnalysis.repetitionScore(spark, Sf).cache()
    assert(r.count() == Tables.documents(spark, Sf).count())
    val bad = r.filter(
      col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
      col("dup_2gram_ratio") < 0 || col("dup_2gram_ratio") > 1 ||
      col("dup_3gram_ratio") < 0 || col("dup_3gram_ratio") > 1).count()
    assert(bad == 0)
    // a doc repeats words iff it repeats no MORE distinct 2-grams than pairs:
    // with any duplicate 2-gram there must be a duplicate word
    val inconsistent = r.filter(col("dup_2gram_ratio") > 0 &&
      col("dup_word_ratio") === 0.0).count()
    assert(inconsistent == 0, "duplicate 2-gram implies a duplicate word")
    r.unpersist()
  }
}
