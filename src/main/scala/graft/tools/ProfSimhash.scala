package graft.tools

import graft.Tables
import graft.operators.{Dedup, IterCheckpoint}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of [[Dedup.simhashPairs]] against a given
  * sf dir — fingerprinting, the capped band join, and each expansion join
  * separately, so a scale probe can attribute where the time goes.
  */
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val (groups, _) = timed("simhash+group+ckpt") {
      IterCheckpoint.checkpoint(
        Dedup.simhash(s, d).select(col("doc_id"),
          expr("cast(conv(simhash, 2, 10) as bigint)").as("h"))
          .groupBy(col("h")).agg(collect_list(col("doc_id")).as("ids")))
    }
    val (fp, _) = timed("fpairs+checkpoint") {
      IterCheckpoint.checkpoint(
        Dedup.simhashFingerprintPairs(groups.select(col("h")), 6, Dedup.HotBandCap))
    }
    println(s"fingerprint pairs: ${fp.count()}")
    time("cross_joins_only") {
      fp.join(groups.select(col("h").as("h_a"), col("ids").as("ids_a")), Seq("h_a"))
        .join(groups.select(col("h").as("h_b"), col("ids").as("ids_b")), Seq("h_b"))
    }
    val expandDf = Dedup.simhashExpand(groups, fp)
    println(s"expanded rows: ${expandDf.count()}")
    time("expand_full") { Dedup.simhashExpand(groups, fp) }
    s.stop()
  }
}
