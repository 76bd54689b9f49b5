package graft.tools

/** Dev-only: run the regime-gated triangle face with an explicit wedge
  * budget, printing the one-row decision record — used to A/B the SAMPLED
  * branch against a budget-substituted DuckDB oracle at small SF (the
  * sf0.01 correctness gate only ever exercises the exact branch) and to
  * demonstrate both regimes at the 100× replica.
  * Usage: runMain graft.tools.TriAutoProbe <sfDir> [maxExactWedges]
  */
object TriAutoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = graft.Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.lift(1).foreach(v =>
      s.conf.set(graft.operators.Graphs.MaxExactWedgesConfKey, v))
    val t0 = System.nanoTime()
    val r = graft.operators.Graphs.triangleCountAuto(s, dir).head()
    println(s"[probe] $dir budget=${graft.operators.Graphs.maxExactWedgesFor(s)} " +
      s"n_wedges=${r.getLong(0)} regime=${r.getString(1)} ip=${r.getLong(2)} " +
      s"n_triangles=${r.getLong(3)} n_sampled=${r.getLong(4)} " +
      f"ok=${r.getBoolean(5)} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    s.stop()
  }
}
