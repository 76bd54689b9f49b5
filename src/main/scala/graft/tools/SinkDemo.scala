package graft.tools

import graft.{Tables, SparkEntry}
import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Usage example + smoke drive for the write-side surface: partitioned
  * layout, bucketed layout (co-located join), idempotent insert-ignore
  * append. Run: `sbt "runMain graft.tools.SinkDemo /root/testdata/sf0.001"`.
  */
object SinkDemo {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_sinks").toString
    val s = Tables.sessionBuilder("local[4]", "4")
      .config("spark.sql.warehouse.dir", s"$out/warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // 1. hive-partitioned parquet: pruning-ready layout
    Sinks.writePartitioned(
      Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
      s"$out/orders_by_year", Seq("o_year"))
    val pruned = s.read.parquet(s"$out/orders_by_year").filter(col("o_year") === 1995)
    println(s"partitioned: 1995 orders = ${pruned.count()}")

    // 2. bucketed tables: the join below reads co-located buckets, no shuffle
    Sinks.writeBucketed(Tables.orders(s, d), "demo_orders", "o_orderkey", 8)
    Sinks.writeBucketed(
      Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
      "demo_lineitem", "o_orderkey", 8)
    val j = s.table("demo_orders").hint("merge").join(s.table("demo_lineitem"), "o_orderkey")
    println(s"bucketed join rows = ${j.count()}")

    // 3. idempotent append (the reference's ON CONFLICT DO NOTHING shape)
    val batch = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    Sinks.appendInsertIgnore(batch, s"$out/orders_ii", "o_orderkey")
    Sinks.appendInsertIgnore(batch, s"$out/orders_ii", "o_orderkey") // re-run: no-op
    println(s"insert-ignore rows = ${s.read.parquet(s"$out/orders_ii").count()}" +
      s" (batch=${batch.count()})")
    s.stop()
  }
}
