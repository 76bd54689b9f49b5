package graft

import graft.operators.{Analytics, Dedup}
import org.apache.spark.sql.functions._

/** Sanity bounds that the DuckDB oracle cannot express: the HLL++ sketch's
  * error bound and structural invariants of the dedup fingerprints.
  */
class AnalyticsSanitySpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct stays within 5x the configured 1% rsd of exact") {
    val exact = Analytics.distinctUsers(spark, Sf)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = Analytics.approxDistinctUsers(spark, Sf)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.05, s"$k: approx=${approx(k)} exact=$n err=$err")
    }
  }

  test("approxDistinctUsersChecked: exact counts out, in-plan gate enforced") {
    val exact = Analytics.distinctUsers(spark, Sf)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val checked = Analytics.approxDistinctUsersChecked(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(checked.keySet == exact.keySet)
    checked.foreach { case (k, (n, ok)) => assert(n == exact(k) && ok) }
    // the gate is live: a negative bound is unsatisfiable (relErr >= 0), so
    // the query must FAIL through assert_true, not pass rows silently.
    // (A tiny rsd wouldn't do: HLL++ rejects it at construction, before the
    // gate ever runs.)
    val ex = intercept[Exception] {
      Analytics.approxDistinctUsersChecked(spark, Sf, boundFactor = -1.0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("HLL++")), s"unexpected error: $ex")
  }

  test("unpivot drops null cells (SQL UNPIVOT semantics, not Spark's retain)") {
    // testdata populates all flag x status cells, so build the hard case by
    // hand: pivot output with an absent combination -> a null cell that
    // Spark's unpivot RETAINS and ours must drop to match the oracle
    val wide = Seq(("A", Some(1.0), None: Option[Double]), ("N", Some(2.0), Some(3.0)))
      .toDF("l_returnflag", "qty_f", "qty_o")
    val melted = wide.unpivot(Array(col("l_returnflag")),
      Array(col("qty_f"), col("qty_o")), "status", "qty")
    assert(melted.count() == 4, "Spark retains the null cell (premise)")
    assert(melted.filter(col("qty").isNotNull).count() == 3)
    // the real query path: no null qty rows can ever come out
    assert(Analytics.unpivotLineitem(spark, Sf)
      .filter(col("qty").isNull).count() == 0)
  }

  test("salted two-stage aggregation equals the direct groupBy") {
    import org.apache.spark.sql.functions._
    // decimal values: associative + order-independent, so equality is exact
    val df = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"))
    val direct = df.groupBy("l_returnflag")
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))
      .as[(String, BigDecimal, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val salted = Analytics.saltedSum(df, "l_returnflag", "q", salts = 8)
      .as[(String, BigDecimal, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == direct)
  }

  test("salted join is row-identical to the plain join under a hot key") {
    import org.apache.spark.sql.functions._
    // 1000 fact rows on ONE key (the pathological single-key partition AQE
    // cannot split) + a normal tail; every salt count must reproduce the
    // plain join's multiset exactly
    val fact = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
      .unionAll(spark.range(50).select((col("id") + 2).as("k"), col("id").as("v")))
    val dim = spark.range(60).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    def landed(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "attr").collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    val plain = landed(fact.join(dim, Seq("k")))
    for (n <- Seq(1, 3, 8))
      assert(landed(Analytics.saltedJoin(fact, dim, "k", n, Seq("k", "v"))) == plain,
        s"salt=$n diverged")
  }

  test("valueHistogram: bins partition each group, edges land as specified") {
    val hist = Analytics.valueHistogram(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bins in [0, 9]; per-group counts sum to the group size
    assert(hist.keys.forall { case (_, b) => b >= 0L && b <= 9L })
    val sizes = Tables.events(spark, Sf).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    sizes.foreach { case (t, n) =>
      val binned = hist.collect { case ((`t`, _), c) => c }.sum
      assert(binned == n, s"$t: $binned binned of $n")
    }
    // the max of each group must land in the last bin (clamp, no phantom
    // 10th bucket) and the min in bin 0 — check via the real extents
    val ext = Tables.events(spark, Sf).groupBy("event_type")
      .agg(min("value").as("vmin"), max("value").as("vmax"))
      .as[(String, Double, Double)].collect()
    ext.foreach { case (t, _, _) =>
      assert(hist.contains((t, 9L)), s"$t: max value must fill bin 9")
      assert(hist.contains((t, 0L)), s"$t: min value must fill bin 0")
    }
  }

  test("activeUsers: WAU bounds DAU and matches a driver recomputation") {
    val got = Analytics.activeUsers(spark, Sf).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ud = Tables.events(spark, Sf)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct().as[(java.sql.Timestamp, Long)].collect()
    val byDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == byDay.keySet)
    got.foreach { case (day, (dau, wau)) =>
      val window = byDay.filter { case (d, _) =>
        !d.after(day) && d.getTime >= day.getTime - 6L * 86400000L }
        .values.flatten.toSet
      assert(dau == byDay(day).size, s"$day DAU")
      assert(wau == window.size, s"$day WAU")
      assert(wau >= dau)
    }
  }

  test("simhash fingerprints are 60-bit strings and deterministic") {
    val fps = Dedup.simhash(spark, Sf).select("simhash").as[String].collect()
    assert(fps.nonEmpty)
    assert(fps.forall(f => f.length == Dedup.SimHashBits && f.forall(c => c == '0' || c == '1')))
    val again = Dedup.simhash(spark, Sf).select("simhash").as[String].collect()
    assert(fps.sorted.toSeq == again.sorted.toSeq)
  }

  test("minhash LSH candidates include every exact-duplicate pair") {
    // documents table ships exact dups (same text, different doc_id):
    // any identical pair has Jaccard 1.0 and must collide in all bands
    val dups = Tables.documents(spark, Sf)
      .groupBy(md5(col("text")).as("fp"))
      .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2 && length(trim(col("fp"))) > 0)
      .select(explode(col("ids")).as("doc_id"), col("fp"))
    val expectedPairs = dups.as("a").join(dups.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val found = Dedup.minhashLshPairs(spark, Sf)
      .filter(col("jaccard") >= 0.999)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // restrict expectation to docs with non-empty shingle sets
    val nonEmpty = Tables.documents(spark, Sf)
      .select(col("doc_id"), Dedup.shingles3(col("text")).as("s"))
      .filter(size(col("s")) > 0).select("doc_id").as[Long].collect().toSet
    val expected = expectedPairs.filter(p => nonEmpty(p._1) && nonEmpty(p._2))
    assert(expected.subsetOf(found),
      s"missing exact-dup pairs: ${expected -- found}")
  }

  test("approxAggChecked: in-plan gate live, integer Horvitz-Thompson scaling") {
    val rows = Analytics.approxAggChecked(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"gate flag must be literally true: $r")
      assert(r.getLong(4) % 20 == 0, s"est_n must be a 20-multiple: $r")
    }
    // the gate is live: a negative bound is unsatisfiable (relErr >= 0)
    intercept[Exception] {
      Analytics.approxAggChecked(spark, Sf, bound = -1.0).collect()
    }
  }

  test("skyline equals brute-force dominance at sf0.001") {
    val got = Analytics.skyline(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val pts = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val expected = pts.filter { case (_, _, price, qty) =>
      !pts.exists { case (_, _, p2, q2) =>
        p2 <= price && q2 >= qty && (p2 < price || q2 > qty)
      }
    }.map(p => (p._1, p._2)).toSet
    assert(expected.nonEmpty, "frontier must be non-empty")
    assert(got == expected,
      s"skyline mismatch: got ${got.size}, expected ${expected.size}")
  }
}
