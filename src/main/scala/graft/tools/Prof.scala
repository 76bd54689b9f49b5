package graft.tools

import graft.{Tables, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only micro profiler: times sub-plans of hot queries against a given
  * sf dir. Not part of the driver contract.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    import graft.operators._
    val docs = Tables.documents(s, d)
    time("docs_scan") { docs }
    time("tokens") { docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t")) }
    time("shingles") { docs.select(col("doc_id"), Dedup.shingles3(col("text")).as("ss")) }
    time("postings_explode") {
      docs.select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("sh")) }
    time("postings_1hash") {
      docs.select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("sh"))
        .select(col("doc_id"), Dedup.md5Hash60(col("sh"), lit(0)).as("h")) }
    time("minhash_signatures") { Dedup.minhashSignatures(s, d) }
    time("lsh_pairs_full") { Dedup.minhashLshPairs(s, d) }
    time("simhash") { Dedup.simhash(s, d) }
    time("simhash_pairs") { Dedup.simhashPairs(s, d) }
    time("ngram_jaccard") { Dedup.ngramJaccardPairs(s, d) }
    time("wordcount_by_lang") { SparkEntry.queries("q_wordcount_by_lang")(s, d) }
    s.stop()
  }
}
