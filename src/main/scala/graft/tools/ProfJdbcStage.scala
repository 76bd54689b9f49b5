package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only probe: where does the JDBC fact-staging window go, and which
  * write shape loads embedded Derby fastest? (r15 verdict task 5: 100×
  * `q_jdbc_fact_scan` cold is ~280 s of staging + ~15 s of scan.)
  *
  * Hypotheses measured head-to-head on the same orders slice:
  *  - `asis`: the production write (source partitioning, batchsize 10000);
  *  - `repart8`: repartition to the fact-scan connection budget first;
  *  - `coalesce1`: one connection, zero lock contention — Derby's
  *    single-writer ceiling (lock ESCALATION: >5000 row locks per
  *    transaction escalate to a table X lock, serializing every other
  *    writer, so N connections may degrade to ~1 effective);
  *  - `noescalate`: asis with `derby.locks.escalationThreshold` raised so
  *    concurrent partition writers keep row-level locks.
  *
  * Usage: runMain graft.tools.ProfJdbcStage <sfDir> <mode> [mult]
  * `mult` self-replicates orders in-flight (orderkey-shifted) so staging
  * volume scales without a pre-built replica dir.
  */
object ProfJdbcStage {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("asis")
    val mult = args.lift(2).map(_.toInt).getOrElse(1)
    val batch = args.lift(3).getOrElse("10000")
    if (mode == "noescalate")
      System.setProperty("derby.locks.escalationThreshold", "1000000")
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val src0 =
      if (mult == 1) base
      else base.crossJoin(s.range(mult).select(col("id").as("copy")))
        .select((col("o_orderkey") + col("copy") * maxKey).as("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"))
    val rows = src0.count()
    val src = mode match {
      case "repart8" => src0.repartition(8)
      case "coalesce1" => src0.coalesce(1)
      case _ => src0
    }
    val url = s"jdbc:derby:memory:graft_prof_${System.nanoTime()};create=true"
    val t0 = System.nanoTime()
    src.write.option("batchsize", batch)
      .jdbc(url, "orders_fact", new java.util.Properties())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[prof-jdbc-stage] mode=$mode mult=$mult batch=$batch rows=$rows " +
      f"secs=$secs%.1f rows_per_sec=${rows / secs}%.0f")
    s.stop()
  }
}
