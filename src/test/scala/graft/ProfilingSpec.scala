package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile: exact counts, nulls, and post-aggregation string casts") {
    val df = Seq(
      (1L, Some("en"), 10),
      (2L, Some("de"), 2),
      (3L, None, 100),
      (4L, Some("en"), 9)).toDF("id", "lang", "len")
    val p = Profiling.profile(df, Seq("id", "lang", "len"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") == ("id", 4L, 0L, 4L, "1", "4"))
    assert(p("lang") == ("lang", 4L, 1L, 2L, "de", "en"))
    // min/max compare NUMERICALLY then cast: "2".."100", not "10".."9"
    assert(p("len") == ("len", 4L, 0L, 4L, "2", "100"))
  }

  test("profileApprox stays within 5x the 1% rsd of the exact face") {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exact = Profiling.profile(Tables.documents(spark, Sf), cols)
      .select(col("column"), col("n_distinct")).as[(String, Long)].collect().toMap
    val approx = Profiling.profileApprox(Tables.documents(spark, Sf), cols)
      .select(col("column"), col("n_distinct")).as[(String, Long)].collect().toMap
    for ((c, ex) <- exact) {
      val ap = approx(c)
      assert(math.abs(ap - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"$c: approx $ap vs exact $ex")
    }
    // both faces agree on everything the sketch does not approximate
    val otherE = Profiling.profile(Tables.documents(spark, Sf), cols)
      .drop("n_distinct").collect().map(_.toSeq).toSet
    val otherA = Profiling.profileApprox(Tables.documents(spark, Sf), cols)
      .drop("n_distinct").collect().map(_.toSeq).toSet
    assert(otherE == otherA)
  }

  test("quality report: clean rules are zero, range rules count exactly") {
    val r = Profiling.qualityReport(spark, Sf).collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2)).toMap
    assert(r.size == 8, s"expected 8 rule rows, got ${r.keySet}")
    // TPC-H-shaped testdata is referentially clean — these must be 0
    assert(r(("orders", "not_null o_custkey")) == 0L)
    assert(r(("orders", "unique o_orderkey")) == 0L)
    assert(r(("lineitem", "fk l_orderkey -> orders")) == 0L)
    // the range rule is chosen to FIRE (quantities run past 30): the count
    // must equal a direct filter, and be nonzero so counting is proven
    val expected = Tables.lineitem(spark, Sf)
      .filter(!col("l_quantity").between(1, 30)).count()
    assert(expected > 0L)
    assert(r(("lineitem", "range l_quantity [1,30]")) == expected)
  }

  test("refIntegrity: driver corpus is clean; doctored orphans are counted exactly") {
    import graft.operators.Profiling
    val report = Profiling.refIntegrity(spark, Sf).collect()
    assert(report.length == 7)
    assert(report.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L),
      s"driver corpus must be referentially clean: ${report.mkString(";")}")
    // detection proof: 2 orphan keys, one key twice -> 3 orphan rows
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 7L, 7L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Profiling.orphanStats("t", child, "ck", parent, "pk",
      smallParent = true).collect()(0)
    assert(row.getLong(1) == 6L && row.getLong(2) == 3L && row.getLong(3) == 2L,
      s"orphan stats wrong: $row")
  }
}
