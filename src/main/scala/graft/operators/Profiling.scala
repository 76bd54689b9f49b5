package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE`-style statistics sweep every
  * ingestion pipeline runs before trusting a new drop: per-column row/null/
  * exact-distinct counts plus string min/max, emitted LONG-format (one row
  * per column) so any column set profiles into one fixed schema.
  *
  * Scale shape: one pass over the table. All per-column counts are partial
  * aggregates (map-side combined); the exact `countDistinct` columns rewrite
  * to Spark's Expand-based multi-distinct — at 100 TB you would flip
  * [[profileApprox]]'s HLL++ sketches instead (same output schema, bounded
  * error), which is why both faces exist. min/max compare raw values cast to
  * string AFTER aggregation (cast-then-min would compare lexicographically).
  */
object Profiling {

  private def longFormat(total: DataFrame, cols: Seq[String]): DataFrame = {
    // stack() fans the single agg row out to one row per column INSIDE the
    // same plan — a union of per-column selects would embed the whole agg
    // subtree once per column
    val cells = cols.map(c =>
      s"'$c', n_rows - n_$c, d_$c, min_$c, max_$c").mkString(", ")
    total.select(col("n_rows"),
      expr(s"stack(${cols.length}, $cells)")
        .as(Seq("column", "n_null", "n_distinct", "min_str", "max_str")))
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }

  /** Exact profile of selected columns (the driver-checkable face). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        countDistinct(col(c)).as(s"d_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    longFormat(df.agg(count(lit(1)).as("n_rows"), aggs: _*), cols)
  }

  /** The 100 TB face: HLL++ sketches for the distinct counts (no Expand
    * blowup, mergeable partials), same schema. Not driver-hashed — the
    * sketch values are engine-specific; `ProfilingSpec` bounds them against
    * the exact face instead (the `approxDistinctUsers` pattern).
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.01): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        approx_count_distinct(col(c), rsd).as(s"d_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    longFormat(df.agg(count(lit(1)).as("n_rows"), aggs: _*), cols)
  }

  /** Query face: profile the documents table's content-bearing columns. */
  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profile(graft.Tables.documents(s, d),
      Seq("doc_id", "lang", "source", "n_chars"))
}
