package graft.tools

/** Dev-only: time the DOULION approximate triangle face on a dense replica
  * where the exact face exceeds its probe allowance (SURVEY §12.6).
  * Usage: runMain graft.tools.TriApproxProbe <sfDir> [invPLog2]
  */
object TriApproxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val inv = args.lift(1).map(_.toInt).getOrElse(2)
    val s = graft.Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = graft.operators.Graphs.triangleCountApprox(s, dir, inv).head()
    println(f"[probe] $dir inv=$inv est=${r.getLong(0)} n_sampled=${r.getLong(1)} ok=${r.getBoolean(2)} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    s.stop()
  }
}
