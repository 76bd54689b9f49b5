package graft

import graft.operators.IngestTransforms
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property tests for the reference transform stage (SURVEY.md §2.3,
  * §5): T2 length-19/'T'-at-10 heuristic boundaries, T3 Python-split word
  * count (""→0), and insert-ignore idempotency.
  */
class IngestTransformsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t2(s: String): String =
    Seq(s).toDF("v")
      .select(IngestTransforms.normalizeIsoTimestamp(col("v")).as("v"))
      .as[String].head()

  private def t3(s: String): Int =
    Seq(s).toDF("v")
      .select(IngestTransforms.wordCount(col("v")).as("n"))
      .as[Int].head()

  // Python reference semantics: len(s.split()) over the Java \s class
  private def pySplitLen(s: String): Int =
    s.split("\\s+").count(_.nonEmpty)

  // ---- T2: ISO-8601 normalization (posts_pipeline.py:38-39 semantics) ----

  test("T2 rewrites a length-19 'T'@10 timestamp") {
    assert(t2("2022-01-01T00:00:00") == "2022-01-01 00:00:00")
  }

  test("T2 applies to ANY string with the shape, not just timestamps") {
    assert(t2("ABCDEFGHIJTKLMNOPQR") == "ABCDEFGHIJ KLMNOPQR")
  }

  test("T2 replaces every 'T', like Python str.replace") {
    // the reference does value.replace('T', ' ') — all occurrences
    assert(t2("2022-01-01T00:T0:00") == "2022-01-01 00: 0:00")
  }

  test("T2 boundary: length 18 and 20 pass through") {
    assert(t2("2022-01-01T00:00:0") == "2022-01-01T00:00:0")
    assert(t2("2022-01-01T00:00:000") == "2022-01-01T00:00:000")
  }

  test("T2 boundary: length 19 without 'T' at index 10 passes through") {
    assert(t2("exactly19charslong!") == "exactly19charslong!")
    assert(t2("2022-01-01 00:T0:00") == "2022-01-01 00:T0:00")
  }

  test("T2 property: non-matching strings are never modified") {
    val gen = Gen.asciiPrintableStr.suchThat(s =>
      s.length != 19 || s.length < 11 || s.charAt(10) != 'T')
    val prop = Prop.forAll(gen) { s => t2(s) == s }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- T3: word_count = Python len(content.split()) (posts_pipeline.py:41) ----

  test("T3 empty string is 0, not 1") {
    assert(t3("") == 0)
  }

  test("T3 whitespace-only string is 0") {
    assert(t3(" \t\n  ") == 0)
  }

  test("T3 splits on whitespace runs and ignores leading/trailing") {
    assert(t3("Hello  world\n foo\tbar ") == 4)
    assert(t3("  one  two  ") == 2)
    assert(t3("single") == 1)
  }

  test("T3 null stays null") {
    val n = Seq[(Int, String)]((1, null)).toDF("id", "v")
      .select(IngestTransforms.wordCount(col("v")).as("n"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("T3 property: matches Python split semantics on ascii + whitespace") {
    val wsChar = Gen.oneOf(' ', '\t', '\n', 'a', 'b', 'x')
    val gen = Gen.listOf(wsChar).map(_.mkString)
    val prop = Prop.forAll(gen) { s => t3(s) == pySplitLen(s) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- T1: schema-driven nested serialization ----

  test("T1 stringifies struct and array columns, leaves scalars") {
    val df = Seq((1L, ("x", 2), Seq("a", "b"))).toDF("id", "st", "arr")
    val out = IngestTransforms.serializeNested(df)
    assert(out.schema.fields.forall(f => f.name == "id" ||
      f.dataType == org.apache.spark.sql.types.StringType))
    val row = out.as[(Long, String, String)].head()
    assert(row == ((1L, """{"_1":"x","_2":2}""", """["a","b"]""")))
  }

  // ---- A1/J3: insert-ignore (posts_pipeline.py:57 semantics) ----

  test("insertIgnore drops batch duplicates and existing keys") {
    val incoming = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "v")
    val existing = Seq((2L, "old")).toDF("id", "v")
    val out = IngestTransforms.insertIgnore(incoming, existing, "id")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("insertIgnore idempotency property: re-loading adds nothing") {
    val keyGen = Gen.listOfN(12, Gen.chooseNum(0L, 8L))
    val prop = Prop.forAll(keyGen, keyGen) { (incKeys, exKeys) =>
      val incoming = incKeys.zipWithIndex.map { case (k, i) => (k, s"v$i") }.toDF("id", "v")
      val existing = exKeys.zipWithIndex.map { case (k, i) => (k, s"e$i") }.toDF("id", "v")
      val first = IngestTransforms.insertIgnore(incoming, existing, "id")
      val after = existing.select("id").union(first.select("id"))
      // second load of the same batch must insert zero rows
      IngestTransforms.insertIgnore(incoming, after.withColumn("v", lit("x")), "id")
        .count() == 0L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("insertIgnoreDeterministic keeps the smallest-order row per key") {
    val incoming = Seq(
      (1L, 3, "late"), (1L, 1, "first"), (1L, 2, "mid"),
      (2L, 9, "only"), (3L, 5, "x"), (3L, 4, "first3")).toDF("id", "seq", "v")
    val existing = Seq((3L, 0, "already")).toDF("id", "seq", "v")
    val out = IngestTransforms
      .insertIgnoreDeterministic(incoming, existing, "id", col("seq"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "first", 2L -> "only"))
  }
}
