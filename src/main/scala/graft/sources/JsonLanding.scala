package graft.sources

import graft.operators.IngestTransforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** The reference's JSON landing-file ingestion path, as one lazy Spark plan.
  *
  * The reference lands API batches as JSON files and re-reads them between
  * Airflow tasks (`posts_pipeline.py:25-32`, `comments_pipeline.py:42-64`);
  * here the whole extract→transform chain is a single declarative plan:
  * schema-applied JSON scan → T1 serialize-nested → T2 timestamp normalize →
  * T3 word_count. A directory of per-(day, post) comment files reads as one
  * multi-file scan — the implicit UNION ALL of SURVEY.md §2.7.
  */
object JsonLanding {

  /** Read a posts landing batch (JSON array file(s)) with the explicit raw
    * schema — never inferred — and apply the transform stage.
    */
  def readPosts(spark: SparkSession, paths: String*): DataFrame =
    transformBatch(
      spark.read.schema(Schemas.postsRaw)
        .option("multiLine", "true").json(paths: _*),
      Schemas.postsFinal)

  /** Read comment landing file(s) (one JSON array per (day, post_id)). */
  def readComments(spark: SparkSession, paths: String*): DataFrame =
    transformBatch(
      spark.read.schema(Schemas.commentsRaw)
        .option("multiLine", "true").json(paths: _*),
      Schemas.commentsFinal)

  /** The transform stage (`posts_pipeline.py:29-44`): T1 stringify nested,
    * T2 normalize `T`-separated timestamps, T3 derive word_count from content.
    *
    * Faithful detail: the reference applies the T2 shape heuristic to EVERY
    * string value (`posts_pipeline.py:38-39` checks the value, not the
    * column), so we run it over every string column — a 19-char title with a
    * 'T' at index 10 would be rewritten in both systems.
    */
  def transformBatch(raw: DataFrame, target: StructType): DataFrame = {
    val serialized = IngestTransforms.serializeNested(raw)
    val normalized = serialized.schema.fields
      .filter(_.dataType == StringType)
      .foldLeft(serialized) { (df, fld) =>
        df.withColumn(fld.name,
          IngestTransforms.normalizeIsoTimestamp(col(fld.name)))
      }
    normalized
      .withColumn("word_count",
        IngestTransforms.wordCount(col("content")).cast("int"))
      .select(target.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
  }
}
