package graft.tools

import graft.Tables
import graft.operators.Similarity

/** Dev-only: print the semantic-contamination recall-vs-cost frontier
  * (r14 — the sweep behind the [[graft.operators.Similarity.ContamProbe]]
  * default choice) for a dataset dir, with wall time per swept face.
  */
object ProfContamSweep {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = Similarity.semanticContaminationSweep(s, d)
      .orderBy("nprobe", "band").collect()
    System.err.println(f"[sweep] wall ${(System.nanoTime() - t0) / 1e9}%.1fs")
    rows.foreach(r => System.err.println(
      f"[sweep] nprobe=${r.getInt(0)}%2d band=${r.getString(1)}%-9s " +
        f"n_true=${r.getLong(2)}%6d n_found=${r.getLong(3)}%6d " +
        f"recall=${r.getDouble(4)}%.3f n_scored=${r.getLong(5)}%9d"))
    s.stop()
  }
}
