package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Readers for the driver's parquet test tables (`TESTDATA.md`).
  *
  * Every query takes `(spark, sfDir)` and resolves its inputs here, so the
  * same code runs at any scale factor. Reads are plain parquet scans —
  * Catalyst pushes filters/projections into the scan (verify via
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos and truncate to micros — exactly what
    * DuckDB does when it loads the same file (its TIMESTAMP is microsecond-
    * precision), so both engines see identical values. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build (see
    * [[sessionBuilder]]) — a reader must not mutate session conf as a side
    * effect.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))

  /** The session configuration every graft entrypoint (Bench, Verify, tests)
    * builds on: UTC wall-clock semantics, NTZ parquet timestamps, nanos-as-long
    * for the events table, AQE on, shuffle partitions sized to local cores.
    */
  def sessionBuilder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.functions.VectorExpressions.register)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // ContextCleaner reclaims broadcast blocks and shuffle files only when
      // their weak references get GC'd. The default periodic-GC interval is
      // 30 MINUTES — longer than a whole bench run — and under a 32g heap
      // organic full GCs essentially never fire, so a long session
      // accumulates every query's broadcasts/shuffles until the block
      // manager strangles unrelated queries (round-3 bench: nonreproducible
      // 100-200s spikes on innocent queries). 30s keeps a long-lived session
      // flat; a full GC on a mostly-dead heap costs well under a second.
      .config("spark.cleaner.periodicGC.interval", "30s")
      // managed tables (the bucketed-layout faces) need a warehouse; keep it
      // out of the repo working dir. Static conf — must be set at build time.
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
