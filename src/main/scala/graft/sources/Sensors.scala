package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Availability preconditions (SURVEY.md §2.1 S8, §2.2 P5): the reference
  * gates each DAG run on an HttpSensor ("posts" substring in the response,
  * `posts_pipeline.py:66-73`) and a SqlSensor (`SELECT 1`, `:76-81`). In a
  * Spark pipeline these are cheap driver-side probes run before submitting
  * the real plan — a LIMIT-1 scan, not a full read.
  */
object Sensors {

  /** Does the path exist at all (file or directory)? */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** SqlSensor analogue: the source parses and yields at least one row.
    * `limit(1)` keeps the probe O(one file split), never a full scan.
    */
  def sourceNonEmpty(read: => DataFrame): Boolean =
    try read.limit(1).count() > 0
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  /** HttpSensor analogue (`"posts" in response.text`): the landed batch
    * contains the expected envelope — here, a required non-null column in
    * the first row.
    */
  def batchLooksValid(read: => DataFrame, requiredCol: String): Boolean =
    try {
      val rows = read.select(requiredCol).limit(1).collect()
      rows.nonEmpty && !rows(0).isNullAt(0)
    } catch {
      case _: org.apache.spark.sql.AnalysisException => false
    }
}
