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
    time("dedup_clusters") { Dedup.dedupClusters(s, d, Dedup.minhashLshPairs(s, d)) }
    time("simhash") { Dedup.simhash(s, d) }
    time("simhash_pairs") { Dedup.simhashPairs(s, d) }
    time("ngram_jaccard") { Dedup.ngramJaccardPairs(s, d) }
    time("wordcount_by_lang") { SparkEntry.queries("q_wordcount_by_lang")(s, d) }
    time("ann_topk_window") { Similarity.bruteForceTopK(s, d) }
    time("ann_topk_aggregator") {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
      corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", Similarity.cosine(col("qvec"), col("nvec")))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, id, cos) => (id, cos) }
        .agg(new graft.functions.TopKAggregator(5).toColumn.name("topk"))
        .flatMap { case (q, topk) =>
          topk.zipWithIndex.map { case ((id, cos), i) => (q, id, i + 1L, cos) }
        }.toDF("query_id", "neighbor_id", "rnk", "cosine")
    }
    s.stop()
  }
}
