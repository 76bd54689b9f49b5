package graft.tools

/** Dev-only: time the EXACT triangle count on a dense replica with an
  * explicit broadcast-cap override — the r11 verdict task-2 probe. The
  * dense 100× co-order graph times out on the shuffle-join wedge paths
  * (268 B wedges materialized through join machinery) but the edge-iterator
  * path never materializes a wedge: it intersects broadcast adjacency
  * arrays per edge, 2·wedges primitive comparisons via the codegen'd
  * `graft_sorted_intersect_n`. On a 128 GiB single JVM the ~m-long
  * adjacency broadcast is affordable far beyond the 4M-edge cluster
  * default, so the probe raises the cap to force that path and records
  * m / wedges / path / count / wall — the committed evidence either way.
  * Usage: runMain graft.tools.TriExactProbe <sfDir> [broadcastMaxEdges]
  */
object TriExactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = args.lift(1).map(_.toLong).getOrElse(200000000L)
    val s = graft.Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val edges = graft.operators.Graphs.coOrderEdges(s, dir)
    val r = graft.operators.Graphs
      .triangleCountEdges(edges, broadcastMaxEdges = cap).head()
    println(f"[probe] $dir cap=$cap n_triangles=${r.getLong(0)} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    s.stop()
  }
}
