package graft.tools

import graft.Tables

/** Dev-only: print a catalog query's formatted physical plan, then execute
  * it with the bench's noop sink and report the wall time — the ".explain
  * and iterate" loop as a one-liner.
  *
  * Usage: runMain graft.tools.Explain <queryName> <sfDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(s, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    System.err.println(f"[explain] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    s.stop()
  }
}
