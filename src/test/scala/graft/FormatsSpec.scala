package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Schema-evolution read contract (q_schema_evolution): the merged scan
  * must union the generation footers — pre-evolution rows read the added
  * column as NULL — and keep every row queryable with its generation.
  * Value parity lives in the DuckDB oracle; these pin the structural
  * contract.
  */
class FormatsSpec extends SparkSpecBase {

  test("schemaEvolutionReport: pre-evolution rows form their own bucket, totals preserved") {
    val o = Tables.orders(spark, Sf)
    val nEven = o.filter(col("o_orderkey") % 2 === 0).count()
    val got = Formats.schemaEvolutionReport(spark, Sf)
    val rows = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("<pre-evolution>") == nEven,
      s"pre-evolution bucket ${rows.get("<pre-evolution>")} != even-key count $nEven")
    assert(rows.values.sum == o.count(), "evolution read lost rows")
    // the evolved column's real values all appear (odd keys carry priority)
    val priorities = o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).toSet
    assert(rows.keySet - "<pre-evolution>" == priorities)
  }
}
