package graft.tools

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dev-only: phase timing for the contamination screen. */
object ProfContam {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[pc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val n = 5
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= n)
    t("tokens_only")(docs.write.format("noop").mode("overwrite").save())
    val gramStrings = array_distinct(transform(
      sequence(lit(1), size(col("t")) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(col("t"), i + k)): _*)))
    t("gram_strings")(docs.select(col("doc_id"), explode(gramStrings).as("g"))
      .write.format("noop").mode("overwrite").save())
    val gramHashes = array_distinct(transform(
      sequence(lit(1), size(col("t")) - (n - 1)),
      i => Dedup.md5Hash60(
        concat_ws(" ", (0 until n).map(k => element_at(col("t"), i + k)): _*),
        lit(0))))
    val grams = docs.select(col("doc_id"), explode(gramHashes).as("gh"))
    t("gram_hashes")(grams.write.format("noop").mode("overwrite").save())
    val evalGrams = grams.filter(col("doc_id") < 50)
      .select(col("gh"), col("doc_id").as("eval_id"))
    val joined = grams.filter(col("doc_id") >= 50).join(broadcast(evalGrams), Seq("gh"))
    t("join")(joined.write.format("noop").mode("overwrite").save())
    t("full_agg")(joined.groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("a"), countDistinct(col("eval_id")).as("b"))
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
