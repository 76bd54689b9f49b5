package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The remaining-TPC-H-class faces (operators/RelFaces.scala): semantic
  * invariants that hold at every scale factor plus the plan properties that
  * decide whether each face survives a 100 TB scale-up (pushdown, broadcast
  * dims, single-pass conditional aggregation — no numerator/denominator
  * self-joins).
  */
class RelFacesSpec extends SparkSpecBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, Sf)

  private def plan(df: DataFrame): String = {
    val executed = df.queryExecution.executedPlan
    val p = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other                    => other.toString
    }
    p + "\n" + df.queryExecution.optimizedPlan.toString
  }

  test("q7: only the two wanted nations survive, directions differ") {
    val rows = q("q7_nation_trade").collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
  }

  test("q8: market share is nation_volume/total_volume and within [0,1]") {
    q("q8_market_share").collect().foreach { r =>
      val (nv, tv, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(share === nv / tv)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q8/q14: share comes from ONE fact scan (no self-join), dims broadcast") {
    // conditional aggregation = exactly one lineitem scan in the plan
    val p8 = plan(q("q8_market_share"))
    assert("lineitem\\.parquet".r.findAllIn(p8).size <= 2, // physical+optimized dump
      s"q8 scans lineitem more than once per plan:\n$p8")
    assert(p8.contains("BroadcastHashJoin"))
    val p14 = plan(q("q14_promo_share"))
    assert("lineitem\\.parquet".r.findAllIn(p14).size <= 2,
      s"q14 scans lineitem more than once per plan:\n$p14")
  }

  test("q11/q15/q20: the re-aggregated global derives from a REUSED fact scan") {
    // These faces re-aggregate their own grouped result (value vs global
    // total / max / per-part total), so the LOGICAL plan names lineitem
    // twice — the one-fact-scan property the scaladocs claim is delivered
    // physically by exchange reuse. Pin it at the EXECUTED adaptive plan
    // (ADVICE r11): after running, the second branch must be a reused
    // exchange/stage, not a second FileScan of the fact.
    for (name <- Seq("q11_important_value", "q15_top_supplier",
        "q20_dominant_supplier")) {
      val df = q(name)
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      val scans = "Scan parquet[^\\n]*lineitem\\.parquet".r.findAllIn(executed).size
      assert(scans <= 1,
        s"$name physically scans lineitem ${scans}x — exchange reuse regressed:\n$executed")
    }
  }

  test("q9: profit identity holds (revenue - 0.6*retail_cost)") {
    q("q9_profit_nation").collect().foreach { r =>
      val rev = r.getAs[Double]("revenue")
      val cost = r.getAs[Double]("retail_cost")
      assert(r.getAs[Double]("sum_profit") === rev - 0.6 * cost)
    }
  }

  test("q10: top-20 returned-revenue ranking is ordered with custkey tiebreak") {
    val rows = q("q10_returned_items").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // fused top-k, not a global sort
    assert(plan(q("q10_returned_items")).contains("TakeOrderedAndProject"))
  }

  test("q12: lag classes partition the joined fact exactly") {
    val rows = q("q12_ship_lag").collect()
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val joined = Tables.lineitem(spark, Sf)
      .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total === joined)
  }

  test("q16: distinct-supplier counts are bounded by the supplier table") {
    val nSupp = Tables.supplier(spark, Sf).count()
    q("q16_supplier_cnt").collect().foreach { r =>
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1L && c <= nSupp)
    }
  }

  test("q8: both shuffle-join inputs are dim-pruned BELOW the orderkey join") {
    // the property the 100x probe established (35.6 -> 6.1 s): the fact-fact
    // orderkey join must sit ABOVE the dim joins on both sides, so each
    // shuffle input is already PROMO-/EUROPE-pruned. Asserted on the
    // optimized LOGICAL plan — AQE may legitimately turn the physical join
    // into a broadcast at tiny SFs, but the logical ordering is what decides
    // the shuffled volume at scale.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    def nodes(p: LogicalPlan): Seq[LogicalPlan] =
      p +: p.children.flatMap(nodes)
    val lp = q("q8_market_share").queryExecution.optimizedPlan
    val factJoin = nodes(lp).collectFirst {
      case j: Join if j.condition.exists { c =>
        val refs = c.references.map(_.name).toSet
        refs.contains("l_orderkey") && refs.contains("o_orderkey")
      } => j
    }.getOrElse(fail("no lineitem-orders orderkey join in the plan"))
    val leftJoins = nodes(factJoin.left).count(_.isInstanceOf[Join])
    val rightJoins = nodes(factJoin.right).count(_.isInstanceOf[Join])
    assert(leftJoins >= 2, s"lineitem side reaches the shuffle un-pruned ($leftJoins dim joins below)")
    assert(rightJoins >= 2, s"orders side reaches the shuffle un-pruned ($rightJoins dim joins below)")
  }

  test("q19: factored predicate envelope reaches both parquet scans") {
    val p = plan(q("q19_disjunctive"))
    // the common p_size<=30 and quantity bounds must be pushed — the
    // residual OR-of-ANDs stays in the broadcast join condition
    assert(p.contains("LessThanOrEqual(p_size,30"), s"p_size not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1") &&
      p.contains("LessThanOrEqual(l_quantity,35"), s"quantity envelope not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
  }

  test("q6: joinless scan — every predicate reaches the parquet scan pushed") {
    // the plan toString truncates PushedFilters at 100 chars; formatted
    // explain prints the full pushed list
    val full = q("q6_forecast_revenue").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!full.contains("Join"), s"q6 must not join:\n$full")
    assert(full.contains("GreaterThanOrEqual(l_shipdate") &&
      full.contains("GreaterThanOrEqual(l_discount,0.05") &&
      full.contains("LessThanOrEqual(l_discount,0.07") &&
      full.contains("LessThan(l_quantity,24"), s"q6 predicates not pushed:\n$full")
    val r = q("q6_forecast_revenue").collect()(0)
    assert(r.getAs[Long]("n_lines") > 0L && r.getAs[Double]("revenue") > 0.0)
  }

  test("q11: every kept part clears twice the independently-computed average") {
    val rows = q("q11_important_value").collect()
    assert(rows.nonEmpty, "scale-invariant cut must keep rows at sf0.001")
    // recompute the per-part average independently (exact decimal → double)
    val byPart = Tables.lineitem(spark, Sf)
      .join(Tables.supplier(spark, Sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, Sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
    val Array(total, np) = byPart.agg(sum(col("v")).cast("double"), count(lit(1)))
      .collect()(0).toSeq.map(_.toString.toDouble).toArray
    rows.foreach(r => assert(r.getAs[Double]("part_value") * np > 2 * total * 0.999))
  }

  test("q13: histogram masses sum to the customer count; zero bucket = anti-join") {
    val rows = q("q13_order_count_dist").collect()
    val nCust = Tables.customer(spark, Sf).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum === nCust)
    // the zero bucket must equal the independently-computed count of
    // customers with NO qualifying order (the left outer join's whole point)
    val zeroCust = Tables.customer(spark, Sf)
      .join(Tables.orders(spark, Sf).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val bucket0 = rows.find(_.getAs[Long]("c_count") == 0L)
      .map(_.getAs[Long]("custdist")).getOrElse(0L)
    assert(bucket0 === zeroCust)
  }

  test("q15: all achievers carry the identical maximal quarter revenue") {
    val rows = q("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1)
    // no per-supplier revenue in the quarter may exceed it
    val best = Tables.lineitem(spark, Sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("r"))
      .agg(max(col("r"))).collect()(0).getDouble(0)
    assert(revs.head === best)
  }

  test("q20: dominance is scale-invariant (non-degenerate) and counts are positive") {
    val rows = q("q20_dominant_supplier").collect()
    assert(rows.nonEmpty, "relative-dominance threshold must keep rows at sf0.001")
    rows.foreach(r => assert(r.getAs[Long]("n_parts") >= 1L))
  }

  test("q22: every kept customer beats the positive-balance mean and is idle") {
    val thr = Tables.customer(spark, Sf).filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("t")).collect()(0).getDouble(0)
    val rows = q("q22_idle_rich").collect()
    assert(rows.nonEmpty)
    // group sums only contain above-threshold balances → every group mean > thr
    rows.foreach { r =>
      assert(r.getAs[Double]("totacctbal") / r.getAs[Long]("numcust") > thr)
    }
  }

  test("dec9Count: in-bound counts cast cleanly, a breach fails LOUDLY, never NULL") {
    // r12 ADVICE: the bare decimal(9,0) cast NULLs at 1e9+ under non-ANSI
    // mode, silently emptying q11/q20's dominance predicate — the guard
    // must turn the breach into a visible failure instead
    import spark.implicits._
    val ok = Seq(1L, 999999999L).toDF("n")
      .select(operators.RelFaces.dec9Count(col("n")).as("d"))
      .collect()
    assert(ok.forall(!_.isNullAt(0)), "in-bound count must survive the cast")
    val breach = intercept[Exception] {
      Seq(1000000000L).toDF("n")
        .select(operators.RelFaces.dec9Count(col("n")).as("d"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(breach).exists(_.contains("decimal(9,0)")),
      s"breach must name the bound: ${messages(breach)}")
  }
}
