package graft

import graft.operators.IngestTransforms
import graft.sources.JsonLanding
import java.time.LocalDateTime
import org.apache.spark.sql.functions._

/** Drives the reference's JSON landing-file ingest path (SURVEY.md §2.1 S3,
  * §2.2 P1) end-to-end over API-shaped fixtures: explicit raw schema →
  * T1 serialize-nested → T2 timestamp normalize → T3 word_count.
  */
class JsonLandingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val posts =
    JsonLanding.readPosts(spark, fixture("/fixtures/posts/posts_batch.json"))

  private lazy val comments = JsonLanding.readComments(spark,
    fixture("/fixtures/comments/2022-01-02_1.json"),
    fixture("/fixtures/comments/2022-01-02_5.json"))

  test("posts batch lands with the full 33-column final schema") {
    assert(posts.schema.fieldNames.toSeq == graft.sources.Schemas.postsFinal.fieldNames.toSeq)
    assert(posts.count() == 3)
  }

  test("T2 on landing: timestamps parse, length-19 titles with 'T'@10 rewritten") {
    val byId = posts.select("id", "date_gmt", "title")
      .as[(Long, LocalDateTime, String)].collect().map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == LocalDateTime.of(2022, 1, 1, 8, 0, 0))
    assert(byId(3L)._2 == LocalDateTime.of(2022, 1, 2, 0, 15, 30))
    // the reference's shape heuristic hits ANY matching string value
    assert(byId(2L)._3 == "ABCDEFGHIJ KLMNOPQR")
    // length 19 without 'T' at index 10: untouched
    assert(byId(3L)._3 == "exactly19charslong!")
  }

  test("T3 on landing: word_count derived with Python split semantics") {
    val wc = posts.select("id", "word_count").as[(Long, Int)].collect().toMap
    assert(wc == Map(1L -> 4, 2L -> 0, 3L -> 2))
  }

  test("T1 on landing: nested author/categories stringified, null stays null") {
    val row = posts.filter($"id" === 1)
      .select("author", "categories", "tags").as[(String, String, String)].head()
    assert(row == (("""{"id":7,"name":"Ann"}""", """["tech","asia"]""", "[]")))
    val nullCat = posts.filter($"id" === 3).select("categories").as[String].head()
    assert(nullCat == null)
  }

  test("multi-file comments read is the implicit UNION ALL (§2.7)") {
    assert(comments.count() == 3)
    assert(comments.select("id").as[Long].collect().sorted.toSeq == Seq(101L, 102L, 201L))
  }

  test("comment threading and nullable fields survive the transform") {
    val c102 = comments.filter($"id" === 102)
      .select("parent", "children", "word_count").as[(Long, String, Int)].head()
    assert(c102 == ((101L, "[]", 3)))
    val c101 = comments.filter($"id" === 101).select("children").as[String].head()
    assert(c101 == "[102]")
    assert(comments.filter($"id" === 101).select("editable_until").head().isNullAt(0))
  }

  test("fan-out lookup join J1: comments of the day's posts, orphans dropped") {
    val dayPosts = posts
      .filter($"date_gmt" >= lit("2022-01-01 00:00:00").cast("timestamp_ntz") &&
        $"date_gmt" < lit("2022-01-02 00:00:00").cast("timestamp_ntz"))
      .select($"id".as("post_id"), $"title".as("post_title_joined"))
    val joined = comments.join(dayPosts, comments("post") === dayPosts("post_id"))
    // post 5 has no post row in the window → comment 201 dropped (inner join)
    assert(joined.select("id").as[Long].collect().sorted.toSeq == Seq(101L, 102L))
  }

  test("insert-ignore over the landed batch: duplicate load is a no-op") {
    val out = IngestTransforms.insertIgnore(posts, posts, "id")
    assert(out.count() == 0)
  }

  test("quarantine: dispositions partition the batch by the corruption rule") {
    val docs = Tables.documents(spark, Sf)
    val nBad = docs.filter($"doc_id" % 7 === 3).count()
    val nGood = docs.count() - nBad
    val got = JsonLanding.quarantineReport(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("parsed") == ((nGood, nGood)), s"parsed: ${got("parsed")}")
    // quarantined rows parse NO fields — whole-record null, raw preserved
    assert(got("quarantined") == ((nBad, 0L)), s"quarantined: ${got("quarantined")}")
  }

  test("quarantine: raw lines are the exact mangled inputs, recoverable") {
    val rows = JsonLanding.quarantinedRaw(spark, Sf).collect()
    // corrupt records parse NO fields — parsed_id is null on every row
    assert(rows.forall(_.isNullAt(1)))
    val raws = rows.map(_.getString(0))
    assert(raws.nonEmpty)
    // every quarantined line is the mangled form: '!' tail, not valid JSON
    assert(raws.forall(r => r.endsWith("!") && r.startsWith("{\"doc_id\":")))
    // and each carries a doc_id satisfying the corruption rule
    val ids = raws.map(r => r.stripPrefix("{\"doc_id\":").takeWhile(_.isDigit).toLong)
    assert(ids.forall(_ % 7 == 3))
  }
}
