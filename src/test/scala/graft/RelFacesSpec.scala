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

  test("q19: factored predicate envelope reaches both parquet scans") {
    val p = plan(q("q19_disjunctive"))
    // the common p_size<=30 and quantity bounds must be pushed — the
    // residual OR-of-ANDs stays in the broadcast join condition
    assert(p.contains("LessThanOrEqual(p_size,30"), s"p_size not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1") &&
      p.contains("LessThanOrEqual(l_quantity,35"), s"quantity envelope not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
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
}
