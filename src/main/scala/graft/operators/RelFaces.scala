package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query classes (q6/q7/q8/q9/q10/q11/q12/q13/q14/q15/
  * q16/q19/q20/q22) as north-star relational faces over the driver's star
  * schema — the ad-hoc SQL surface a user of the reference's Adminer console
  * would reach for (reference: `init_db_tables.sh:5-59` defines the
  * analogous star DDL; the reference itself ships no analytics beyond
  * SELECT *). Together with the classes already in [[Analytics]] (q1/q2/q3/
  * q4/q5/q17/q18/q21 — `pricingSummary`, `minCostSupplier`,
  * `shippingPriority`, `existsReturnedOrders`, `localSupplierVolume`,
  * `correlatedAvgQuantity`, `largeVolumeCustomers`, `waitingSuppliers`)
  * every one of the 22 TPC-H query classes has an oracle-checked face.
  *
  * The driver schema lacks `partsupp`, `l_shipmode`, `l_commitdate`,
  * `p_container`, and `c_phone`, so several faces are documented
  * adaptations:
  *  - q9 prices cost from `p_retailprice` instead of `ps_supplycost`;
  *  - q11 measures a nation's per-part shipped value from `lineitem`
  *    instead of `partsupp` stock value — same grouped-sum vs
  *    fraction-of-global-scalar HAVING shape;
  *  - q12 classifies shipping lag (`l_shipdate - o_orderdate`) instead of
  *    shipmode/commit-receipt windows — same CASE-sum shape;
  *  - q13 stands in `o_orderpriority` for the comment-pattern exclusion;
  *  - q16 counts distinct suppliers observed in `lineitem` instead of
  *    `partsupp` rows;
  *  - q20 takes "supplier holds excess stock" to "supplier shipped more
  *    than half the part's total quantity" — same nested two-level
  *    aggregate + semi-join-back shape;
  *  - q22 groups idle rich customers by nation instead of phone prefix.
  * The plan shapes — which is what these faces exist to exercise — are the
  * canonical ones: conditional aggregation, disjunctive pushdown, scalar
  * subquery broadcast, anti join, count-distinct rollup, outer-join
  * histogram, argmax-by-global-scalar, nested aggregate semi-join.
  *
  * Determinism-for-oracle: money sums ride `decimal(18,2)` (exact,
  * associative — see [[Analytics]] header); ratios are ONE double division
  * of decimal sums (bit-identical across engines); every top-k carries a
  * unique-key tiebreak.
  *
  * Scale notes: every dim join rides a SIZE-GATED broadcast hint
  * ([[DimBroadcast]] — hint below a 128 MiB stats estimate, pass through to
  * the shuffle join above it, r11 verdict task 1); nation is 25 rows and
  * part/customer/supplier ~1e-2 of lineitem, so at every tested replica the
  * gated plan is byte-identical to the old unconditional hint, while at
  * SF 10k+ the same code yields the shuffle join instead of an executor
  * OOM. The lineitem⋈orders fact-fact join shuffles on the join key and is
  * AQE-planned, with BOTH inputs broadcast-dim-pruned BEFORE the shuffle
  * wherever a face filters on a dim (see [[marketShare]] — 35.6 → 6.1 s at
  * the 100× replica). Conditional aggregates keep everything in one pass
  * over the fact — no self-joins, no windows. The only remaining EXPLICIT
  * `broadcast()` hints are the provably-single-row scalar frames (q11's
  * total, q15's best, q22's threshold): their bound is structural (global
  * aggregate ⇒ one row), which no size estimator can see.
  */
object RelFaces {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def revenue: Column = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))

  /** Count → decimal(9,0) with a LOUD overflow guard. Under non-ANSI mode
    * the bare cast yields NULL at 1e9+, the dominance predicate it feeds
    * becomes NULL, and every row is silently dropped — an empty answer
    * instead of an error (r12 ADVICE). `assert_true` folds into the same
    * codegen'd projection (NULL when the bound holds, so the `when` always
    * takes the cast branch) and turns a corpus that breaches the
    * documented bound into a visible job failure naming the fix.
    */
  private[graft] def dec9Count(c: Column): Column =
    when(assert_true(c < lit(1000000000L),
      lit("group count breaches the documented decimal(9,0) bound of this " +
        "dominance face; move the predicate to decimal(38,0)-scaled integers"))
      .isNull,
      c.cast("decimal(9,0)"))

  /** q6-class: the forecasting-revenue-change scan — a single filtered pass
    * with NO join at all; exists to pin that every predicate (date range,
    * discount band, quantity cap) reaches the parquet scan as a pushed
    * filter and the aggregate runs map-side (asserted in RelFacesSpec).
    * Discount values are exact two-decimal doubles in the data; both
    * engines parse the identical IEEE literals, so the band compare is
    * bit-deterministic.
    */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** q7-class: trade volume between two nations by direction and year.
    * The disjunctive nation-pair predicate `(s=3 ∧ c=7) ∨ (s=7 ∧ c=3)` is
    * applied AFTER both nation joins on the joined row — Catalyst folds the
    * per-side IN(3,7) restriction out of it, so both broadcast joins still
    * prune to two nations before the residual pair filter runs.
    */
  def nationTradeVolume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val wanted = Seq("NATION_3", "NATION_7")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(DimBroadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(DimBroadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(DimBroadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(DimBroadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation").isin(wanted: _*) && col("cust_nation").isin(wanted: _*) &&
        col("supp_nation") =!= col("cust_nation"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenue).cast("double").as("volume"),
        count(lit(1)).as("n_lines"))
  }

  /** q8-class: a nation's market share inside one region's market, by year.
    * Share = conditional decimal sum / total decimal sum — ONE double
    * division per group; the fact is scanned once (no numerator/denominator
    * self-join).
    *
    * Plan shape: the ONLY shuffle is the lineitem⋈orders orderkey join, and
    * BOTH of its inputs are pruned by their broadcast dims FIRST — PROMO
    * parts keep ~1/6 of lineitem, EUROPE customers keep ~1/5 of orders —
    * so the shuffled volume is ~1/6 + ~1/5 of the fact tables instead of
    * all of both (Catalyst does not reorder across a shuffle join without
    * CBO stats, so the join order is stated explicitly; measured 35.6 s →
    * 6.1 s at the 100× replica — `BENCH_100x_rel.json`).
    */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val europe = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_nk"))
    val suppNation = Tables.nation(s, d).select(
      col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val promoParts = Tables.part(s, d).filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val promoLines = Tables.lineitem(s, d)
      .join(DimBroadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(DimBroadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(DimBroadcast(suppNation), col("s_nationkey") === col("supp_nk"))
      .select(col("l_orderkey"), col("supp_nation"), revenue.as("rev_dec"))
    val euroOrders = Tables.orders(s, d)
      .join(DimBroadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(DimBroadcast(europe), col("c_nationkey") === col("cust_nk"))
      .select(col("o_orderkey"), col("o_orderdate"))
    promoLines
      .join(euroOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", col("rev_dec")).otherwise(dec(lit(0))))
          .cast("double").as("nation_volume"),
        sum(col("rev_dec")).cast("double").as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
  }

  /** q9-class (adapted): pseudo-profit by supplier nation and year for parts
    * whose name mentions a color. The schema has no `ps_supplycost`, so cost
    * is priced from the part's own `p_retailprice` (60% of retail × qty) —
    * the plan shape (LIKE-filtered part dim broadcast into the fact, profit
    * arithmetic in the projection, nation×year rollup) is canonical q9.
    *
    * Determinism: revenue and retail×qty are each a TWO-factor decimal
    * product (precision 37 — exact in both engines); the 0.6 factor is
    * applied AFTER the decimal sums land in double, so profit is two IEEE
    * ops on identical inputs. A triple decimal product would blow past
    * precision 38 where Spark rounds and DuckDB widens — engines diverge.
    */
  def profitByNation(s: SparkSession, d: String): DataFrame = {
    val redParts = Tables.part(s, d).filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val nation = Tables.nation(s, d).select(
      col("n_nationkey").as("supp_nk"), col("n_name"))
    Tables.lineitem(s, d)
      .join(DimBroadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(DimBroadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(DimBroadcast(nation), col("s_nationkey") === col("supp_nk"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revenue).cast("double").as("revenue"),
        sum(dec(col("p_retailprice")) * dec(col("l_quantity"))).cast("double").as("retail_cost"),
        count(lit(1)).as("n_lines"))
      .withColumn("sum_profit", col("revenue") - lit(0.6) * col("retail_cost"))
  }

  /** q10-class: top-20 customers by revenue returned in one quarter.
    * Returned-lineitem fact join + customer/nation dims; top-k via
    * TakeOrderedAndProject with the unique custkey tiebreak.
    */
  def returnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val nation = Tables.nation(s, d).select(
      col("n_nationkey").as("cust_nk"), col("n_name"))
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(DimBroadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(DimBroadcast(nation), col("c_nationkey") === col("cust_nk"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** q12-class (adapted): shipping-lag classes × order priority. The schema
    * has no shipmode/commitdate, so the lag between order and ship date
    * stands in for the mode — the CASE-sum shape (urgent vs non-urgent
    * counts per class, single pass, map-side partial agg) is canonical q12.
    */
  def shipLagPriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
      .withColumn("lag_class",
        when(col("lag_days") <= lit(30), "FAST")
          .when(col("lag_days") <= lit(90), "NORMAL")
          .otherwise("SLOW"))
      .groupBy(col("lag_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))

  /** q14-class: promo revenue share for one ship-month. Numerator and
    * denominator from ONE scan (conditional decimal sums), share as one
    * double division.
    */
  def promoShare(s: SparkSession, d: String): DataFrame = {
    val isPromo = col("p_type") === "PROMO"
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(DimBroadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(isPromo, revenue).otherwise(dec(lit(0)))).cast("double").as("promo_revenue"),
        sum(revenue).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  /** q16-class (adapted): how many distinct suppliers have shipped each
    * (brand, type, size) part family, excluding one brand and restricting to
    * a size list. Supplier evidence comes from `lineitem` (no `partsupp` in
    * the schema); the rollup is the canonical partial-agg'd count-distinct —
    * Spark plans it as two-phase HashAggregate over (family, suppkey).
    */
  def supplierCountByPart(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#9" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, d)
      .join(DimBroadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** q19-class: disjunctive brand/size/quantity predicates. The OR-of-ANDs
    * lives in the JOIN's residual condition; the common `p_size <= 30` and
    * quantity envelope are factored so Catalyst pushes them into both scans
    * (PushedFilters — asserted in RelFacesSpec), leaving the residual
    * disjunction to the broadcast join.
    */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
      .filter(col("p_size") <= 30)
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 35)
    val clause =
      (col("p_brand") === "Brand#1" && col("p_size") <= 10 &&
        col("l_quantity") >= 1 && col("l_quantity") <= 15) ||
      (col("p_brand") === "Brand#2" && col("p_size") <= 20 &&
        col("l_quantity") >= 10 && col("l_quantity") <= 25) ||
      (col("p_brand") === "Brand#3" && col("p_size") <= 30 &&
        col("l_quantity") >= 20 && col("l_quantity") <= 35)
    li.join(DimBroadcast(part), col("l_partkey") === col("p_partkey") && clause)
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** q22-class (adapted): idle rich customers by nation. The global
    * "average positive balance" is a scalar aggregate broadcast into the
    * filter (Catalyst: scalar-subquery → literal at runtime via the
    * cross-join-free BroadcastNestedLoop-of-one AQE collapses); "no recent
    * orders" is a left-anti join. Grouped by nation instead of the absent
    * phone prefix. The threshold is a decimal-sum / count double — ONE IEEE
    * division, identical in the oracle.
    */
  def idleRichCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val threshold = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("thr"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val nation = Tables.nation(s, d).select(
      col("n_nationkey").as("cust_nk"), col("n_name"))
    cust
      .join(broadcast(threshold))
      .filter(col("c_acctbal") > col("thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(DimBroadcast(nation), col("c_nationkey") === col("cust_nk"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  /** q11-class (adapted): parts that carry an outsized share of one
    * nation's shipped value. No `partsupp`, so "stock value" is the
    * shipped `l_extendedprice` sum from `lineitem` restricted to NATION_3
    * suppliers. The HAVING threshold is relative to the GLOBAL aggregate —
    * derived by re-aggregating the grouped result (one fact scan; the
    * scalar rides a broadcast join back onto the groups, the same plan
    * Catalyst builds for the scalar-subquery SQL). Canonical q11's
    * `value > f·total` with a FIXED f degenerates with the part count
    * (empty below 1/f parts, everything above), so like [[dominantSuppliers]]
    * the cut is scale-invariant: "more than twice the AVERAGE part's
    * value", compared as `value · n_parts > 2 · total` in EXACT
    * integer-times-decimal arithmetic — no IEEE division in the predicate,
    * non-degenerate at any replica factor.
    *
    * Exactness bound (r11 ADVICE): the count rides `decimal(9,0)` so the
    * product decimal(28,2)·decimal(9,0) needs precision 38 — INSIDE Spark's
    * cap, no silent `allowPrecisionLoss` scale truncation. The stated
    * bounds are np < 10^9 distinct parts per nation's shipments and
    * Σ value < 10^26 — at SF 100k the real magnitudes are ~2·10^10 total
    * parts (so a PER-NATION np within bound) and Σ value ~10^16, both
    * orders of magnitude inside; a corpus that breaches them needs the
    * predicate moved to decimal(38,0)-scaled integers, not this face.
    */
  def importantPartValue(s: SparkSession, d: String): DataFrame = {
    val natSupp = Tables.supplier(s, d)
      .join(DimBroadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val byPart = Tables.lineitem(s, d)
      .join(DimBroadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value_dec"))
    val total = byPart.agg(sum(col("value_dec")).as("total_dec"),
      count(lit(1)).as("np"))
    byPart.join(broadcast(total))
      .filter(col("value_dec") * dec9Count(col("np")) > col("total_dec") * lit(2))
      .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
  }

  /** q13-class: the order-count distribution — how many customers placed
    * exactly k qualifying orders, INCLUDING the zero-order customers that
    * only a left outer join can see (the whole point of the class). The
    * comment-pattern exclusion becomes an `o_orderpriority` exclusion.
    * Two-level aggregate: count per customer (shuffle on custkey), then
    * the tiny histogram rollup.
    */
  def orderCountDistribution(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** q15-class: the top supplier(s) of a quarter — revenue per supplier,
    * keep every achiever of the global maximum. The max is re-aggregated
    * from the grouped result (one fact scan) and compared in EXACT decimal,
    * so "equals the max" is engine-independent; ALL tied achievers survive,
    * which makes the face deterministic without a tiebreak.
    *
    * The `l_suppkey.isNotNull` is stated EXPLICITLY even though the final
    * inner supplier join implies it: Catalyst pushes that join's IsNotNull
    * into only the rev branch's scan, making the two aggregation subtrees
    * canonically UNEQUAL — exchange reuse then silently fails and the fact
    * is scanned twice (caught by the RelFacesSpec single-scan pin this
    * round; the r11 ADVICE predicted precisely this class). Stating it
    * upstream puts the identical filter in both branches, so the "one fact
    * scan" the scaladoc claims is what the executed plan actually does.
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("rev_dec"))
    val best = rev.agg(max(col("rev_dec")).as("best_dec"))
    rev.join(broadcast(best))
      .filter(col("rev_dec") === col("best_dec"))
      .join(DimBroadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  /** q20-class (adapted): suppliers who dominate a part family's supply.
    * No `partsupp` stock, so "holds excess stock" becomes "shipped MORE
    * THAN TWICE THE AVERAGE supplier's share of that part's total
    * quantity" — the same nested two-level aggregate (per part×supplier,
    * then per part) with a correlated threshold, resolved as a broadcast
    * join of the per-part totals instead of a correlated subquery re-scan.
    * The average-share compare is `q·n_suppliers > 2·total` in EXACT
    * integer-times-decimal arithmetic (no division), and — unlike an
    * absolute "more than half" cut — it is SCALE-INVARIANT: densifying the
    * fact N× dilutes every supplier's absolute share but preserves
    * relative dominance, so the face stays non-degenerate at any replica
    * factor. Dominating pairs then semi-join back onto supplier+nation
    * dims and roll up to (supplier, nation, #parts dominated).
    */
  def dominantSuppliers(s: SparkSession, d: String): DataFrame = {
    val blueParts = Tables.part(s, d).filter(col("p_name").contains("blue"))
      .select(col("p_partkey"))
    // l_suppkey.isNotNull stated upstream for the same reason as
    // [[topSupplier]]: the supplier join pushes its IsNotNull into only the
    // psQty branch, de-canonicalizing the two aggregation subtrees and
    // breaking exchange reuse (two fact scans instead of one — caught by
    // the RelFacesSpec single-scan pin)
    val psQty = Tables.lineitem(s, d)
      .filter(col("l_suppkey").isNotNull)
      .join(DimBroadcast(blueParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("q_dec"))
    val partTotal = psQty.groupBy(col("l_partkey"))
      .agg(sum(col("q_dec")).as("tq_dec"), count(lit(1)).as("ns"))
    val nation = Tables.nation(s, d).select(
      col("n_nationkey").as("supp_nk"), col("n_name"))
    // partTotal is FACT-derived (one row per blue part — scales with SF,
    // unlike the dim-table broadcasts the header rationalizes), so it gets
    // NO broadcast hint: the partkey equi-join shuffles, psQty arrives
    // already partitioned by (partkey, suppkey) from its aggregation, and
    // AQE converts the join to broadcast at runtime whenever partTotal is
    // actually small — free at test scale, correct at 100 TB.
    psQty.join(partTotal, Seq("l_partkey"))
      .filter(col("q_dec") * dec9Count(col("ns")) > col("tq_dec") * lit(2))
      .join(DimBroadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(DimBroadcast(nation), col("s_nationkey") === col("supp_nk"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("n_parts"))
  }
}
