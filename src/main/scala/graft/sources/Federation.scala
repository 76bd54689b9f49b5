package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-source federation: parquet fact ⋈ JDBC dimension — the exact shape
  * of the reference's migration period, where history lives in Postgres
  * (the pipelines' only store, reference `docker/` setup) while new data
  * lands columnar.
  * A user switching engines runs MONTHS in this mixed state; making it a
  * first-class, oracle-checked face is what lets them switch incrementally
  * instead of big-bang.
  *
  * Scale shape: the JDBC side sends ONLY the projected columns across the
  * wire (column pruning is pushed into the generated SELECT — plan-asserted
  * in FederationSpec), and a dimension-sized result broadcasts to the fact
  * scan, so the parquet side never shuffles. A fact-sized JDBC table would
  * instead use `partitionColumn/lowerBound/upperBound/numPartitions` for a
  * parallel range read — documented here, not exercised: the sandbox's
  * embedded Derby is the stand-in for Postgres either way.
  */
object Federation {

  private val staged =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private val dbSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The federated dimension table name inside the staged database. */
  val DimTable = "orders_dim"

  /** Stage a dimension-sized orders slice (every 100th key) into an
    * embedded in-memory Derby once per (session, dataset) and return its
    * JDBC url — the sandbox's Postgres stand-in (same `df.write.jdbc` /
    * `spark.read.jdbc` call shape, see README's migration section).
    */
  private[graft] def ordersDimUrl(s: SparkSession, d: String): String =
    staged.getOrElseUpdate((s, d), {
      val url = s"jdbc:derby:memory:graft_fed_${dbSeq.incrementAndGet()};create=true"
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.option("batchsize", "10000")
        .jdbc(url, DimTable, new java.util.Properties())
      url
    })

  /** Driver face: revenue by status over parquet lineitem joined to the
    * JDBC dimension. The oracle recomputes from the parquet orders the
    * dimension was loaded from — federation must change the sources, never
    * the answer.
    */
  def jdbcDimJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val dim = s.read.jdbc(ordersDimUrl(s, d), DimTable, new java.util.Properties())
    Tables.lineitem(s, d)
      .join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("sum_price"),
        count(lit(1)).as("n"))
  }
}
