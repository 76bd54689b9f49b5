package graft

import graft.operators.DimBroadcast
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The size gate on dimension broadcast hints (r11 verdict task 1): below
  * the cap the gate must emit the hint (test-scale plans stay identical to
  * the old unconditional `broadcast()`); above it the hint must NOT appear
  * in the plan, leaving the join shape to the planner — the at-SF-10k+
  * fallback the RelFaces scaladoc promises.
  */
class DimBroadcastSpec extends SparkSpecBase {

  // the optimizer folds ResolvedHint into the Join node's JoinHint, so hint
  // presence is pinned at the ANALYZED plan — the artifact the gate emits
  private def hintCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size

  test("under the cap: the gate emits a broadcast hint and the join plans BHJ") {
    val joined = Tables.orders(spark, Sf)
      .join(DimBroadcast(Tables.customer(spark, Sf)),
        col("o_custkey") === col("c_custkey"))
    assert(hintCount(joined) === 1, "tiny dim must be hinted")
    val p = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other                    => other.toString
    }
    assert(p.contains("BroadcastHashJoin"), s"gated dim not broadcast:\n$p")
  }

  test("over the cap: the gate passes through — no hint forced into the plan") {
    val joined = Tables.orders(spark, Sf)
      .join(DimBroadcast(Tables.customer(spark, Sf), capBytes = 1L),
        col("o_custkey") === col("c_custkey"))
    assert(hintCount(joined) === 0,
      "an over-cap dim must NOT carry a broadcast hint (AQE may still " +
        "convert at runtime from measured sizes — that is the planner's " +
        "call, not a forced hint)")
    // and the fallback plan still computes the same rows
    assert(joined.count() ===
      Tables.orders(spark, Sf)
        .join(Tables.customer(spark, Sf), col("o_custkey") === col("c_custkey"))
        .count())
  }

  test("every relational face still plans at least one broadcast dim at test scale") {
    // the gate must be invisible at tested replicas: spot-check the faces
    // the r11 verdict named (customer/supplier hint sites)
    for (name <- Seq("q7_nation_trade", "q9_profit_nation", "q10_returned_items",
        "q20_dominant_supplier")) {
      val df = SparkEntry.queries(name)(spark, Sf)
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      assert(p.contains("BroadcastHashJoin"), s"$name lost its dim broadcast:\n$p")
    }
  }
}
