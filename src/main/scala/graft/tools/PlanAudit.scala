package graft.tools

import graft.Tables

/** Dev-only sweep: for every catalog query, build the frame (no execution
  * beyond what construction itself runs — gates, cuts sampling, staging)
  * and report how many times each parquet table appears in the physical
  * plan plus the Exchange/Generate counts. The r20 lesson this tool
  * encodes: "inspected the code" is not "captured the plan" — duplicated
  * subtrees (one frame feeding two consumers) only show up here.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> [nameFilter]
  * Output (stdout, one line per face):
  *   <name>  exch=<n> gen=<n> scans{table=count,...}  dup=<tables scanned >1>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val filt = args.lift(1)
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filt.forall(n.contains))
    val scanRe = "Location: [A-Za-z]+FileIndex \\[[^\\]]*?([A-Za-z0-9_.-]+\\.parquet)".r
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(s, dir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val scans = scanRe.findAllMatchIn(p).map(_.group(1)).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        val exch = "(?<!Reused)Exchange".r.findAllIn(p).size
        val gen = "Generate".r.findAllIn(p).size
        val dup = scans.filter(_._2 > 1).keys.toSeq.sorted.mkString(",")
        println(f"$n%-32s exch=$exch%-3d gen=$gen%-3d " +
          s"scans{${scans.toSeq.sortBy(_._1).map { case (t, c) => s"$t=$c" }.mkString(",")}}" +
          (if (dup.nonEmpty) s"  DUP=$dup" else ""))
      } catch {
        case e: Throwable =>
          println(f"$n%-32s ERR ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(100).replace('\n', ' '))
      }
    }
    s.stop()
  }
}
