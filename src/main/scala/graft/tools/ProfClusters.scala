package graft.tools

import graft.Tables
import graft.operators.Dedup

/** Dev-only: isolate the dedup-clusters query's phases at a given sf dir. */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profc] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val pairs = t("pairs_build+persist") {
      val p = Dedup.minhashLshPairs(s, d).persist()
      System.err.println(s"[profc] n_pairs = ${p.count()}")
      p
    }
    val labels = t("cluster_labels_loop") { Dedup.clusterLabels(pairs) }
    t("final_count") { System.err.println(s"[profc] n_labeled = ${labels.count()}") }
    // drop the phase probes' cached/checkpointed state before the full-query
    // run so it measures a clean session, not a second persisted copy
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    t("full_query_write") {
      Dedup.dedupClusters(s, d, Dedup.minhashLshPairs(s, d))
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
