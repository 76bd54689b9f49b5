package graft.sources

import org.apache.spark.sql.types._

/** Explicit StructType constants for the reference's two target tables —
  * fixed, externally-declared schemas, never inferred (SURVEY.md §1.3).
  *
  * Column set and nullability follow the Postgres DDL
  * (`/root/reference/docker/postgres/init_db_tables.sh:5-39` posts,
  * `:41-59` comments). Postgres `JSON` columns are StringType carrying JSON
  * text (the reference stringifies nested values before load,
  * `posts_pipeline.py:36-37`); `INT` keys widen to LongType for scale.
  *
  * Two variants per table:
  *  - `*Raw`: the API landing shape — nested values still typed
  *    (struct/array), timestamps still ISO `T`-separated strings. This is
  *    what `spark.read.schema(...).json(landingDir)` uses.
  *  - `*Final`: the post-transform relational shape (all JSON stringified,
  *    timestamps TimestampNTZ, word_count derived).
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean) = StructField(n, t, nullable)

  /** Open-ended nested payloads arrive as arbitrary JSON; at the raw layer we
    * keep them as untyped JSON text via a permissive string read, except the
    * few the pipeline actually touches.
    */
  val postsFinal: StructType = StructType(Seq(
    f("id", LongType, nullable = false),
    f("date_gmt", TimestampNTZType, nullable = false),
    f("modified_gmt", TimestampNTZType, nullable = false),
    f("title", StringType, nullable = false),
    f("slug", StringType, nullable = false),
    f("status", StringType, nullable = false),
    f("type", StringType, nullable = false),
    f("link", StringType, nullable = false),
    f("content", StringType, nullable = false),
    f("vsitems", StringType, nullable = true),
    f("live_items", StringType, nullable = true),
    f("excerpt", StringType, nullable = false),
    f("author", StringType, nullable = true),
    f("editor", StringType, nullable = false),
    f("comment_status", StringType, nullable = false),
    f("comments_count", IntegerType, nullable = false),
    f("comments", StringType, nullable = true),
    f("featured_image", StringType, nullable = true),
    f("post_images", StringType, nullable = true),
    f("seo", StringType, nullable = true),
    f("categories", StringType, nullable = true),
    f("tags", StringType, nullable = true),
    f("companies", StringType, nullable = true),
    f("is_sponsored", BooleanType, nullable = false),
    f("sponsor", StringType, nullable = true),
    f("is_partnership", BooleanType, nullable = false),
    f("external_scripts", StringType, nullable = true),
    f("show_ads", BooleanType, nullable = false),
    f("is_subscriber_exclusive", BooleanType, nullable = false),
    f("is_paywalled", BooleanType, nullable = false),
    f("is_inappbrowser", BooleanType, nullable = false),
    f("read_time", IntegerType, nullable = false),
    f("word_count", IntegerType, nullable = true),
  ))

  val commentsFinal: StructType = StructType(Seq(
    f("id", LongType, nullable = false),
    f("post", LongType, nullable = false),
    f("post_title", StringType, nullable = false),
    f("post_link", StringType, nullable = false),
    f("post_featured_image", StringType, nullable = true),
    f("post_comments_count", IntegerType, nullable = false),
    f("content", StringType, nullable = false),
    f("excerpt", StringType, nullable = false),
    f("status", StringType, nullable = false),
    f("type", StringType, nullable = false),
    f("parent", LongType, nullable = true),
    f("author", StringType, nullable = false),
    f("date_gmt", TimestampNTZType, nullable = false),
    f("can_edit", BooleanType, nullable = false),
    f("editable_until", TimestampNTZType, nullable = true),
    f("children", StringType, nullable = true),
    f("word_count", IntegerType, nullable = true),
  ))

  /** Raw landing shape for posts: nested columns typed (author as struct,
    * categories/tags as arrays, …) and timestamps as ISO strings — what the
    * WordPress API batch file contains (`posts_pipeline.py:25-27`).
    */
  val postsRaw: StructType = StructType(postsFinal.fields.map { fld =>
    fld.name match {
      case "date_gmt" | "modified_gmt" => fld.copy(dataType = StringType)
      case "author"                    => fld.copy(dataType = StructType(Seq(
        f("id", LongType, nullable = true), f("name", StringType, nullable = true))))
      case "categories" | "tags"       => fld.copy(dataType = ArrayType(StringType))
      case _                           => fld
    }
  })

  val commentsRaw: StructType = StructType(commentsFinal.fields.map { fld =>
    fld.name match {
      case "date_gmt" | "editable_until" => fld.copy(dataType = StringType)
      case "author"                      => fld.copy(dataType = StructType(Seq(
        f("id", LongType, nullable = true), f("name", StringType, nullable = true))))
      case "children"                    => fld.copy(dataType = ArrayType(LongType))
      case _                             => fld
    }
  })
}
