package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only: materialize an N× replica of the documents/embeddings tables
  * (id-shifted copies, exact-duplicate text/vectors) so the dedup/similarity/
  * corpus-prep operators can be measured beyond the largest driver-provided
  * scale factor. Exact copies are the realistic stress shape for dedup: every
  * source doc becomes an N-member near-dup cluster, so pair volume grows
  * ~N²/2 per cluster while the banded joins must stay population-capped.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(s, src)
    val emb = Tables.embeddings(s, src)
    val nDocs = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val nVecs = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val copies = s.range(factor).select(col("id").as("copy"))
    docs.crossJoin(copies)
      .select((col("doc_id") + col("copy") * nDocs).as("doc_id"),
        col("lang"), col("text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    emb.crossJoin(copies)
      .select((col("vec_id") + col("copy") * nVecs).as("vec_id"),
        col("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    System.err.println(s"[scaleup] wrote ${nDocs * factor} docs, ${nVecs * factor} vecs to $dst")
    s.stop()
  }
}
