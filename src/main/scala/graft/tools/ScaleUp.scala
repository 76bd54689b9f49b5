package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Dev-only: materialize an N× replica of the corpus-shaped tables so
  * operators can be measured beyond the largest driver-provided scale factor.
  * Replication shapes are chosen ADVERSARIALLY per table:
  *
  *  - documents/embeddings: id-shifted exact copies — every source doc
  *    becomes an N-member near-dup cluster, so pair volume grows ~N²/2 per
  *    cluster while the banded joins must stay population-capped;
  *  - events: event_id-shifted copies with user_id KEPT — each user's
  *    history densifies N×, stressing per-user windows, funnel chains,
  *    session state, and the rolling range frames (a user-id shift would
  *    just add independent users, which is the easy direction);
  *  - lineitem: l_orderkey-shifted copies with l_partkey ROTATED per copy
  *    (pk + copy·7919 mod |parts|) — identical copies would re-create the
  *    SAME baskets and leave the distinct co-order edge set unchanged
  *    (measured: 1.196M edges at 1× AND at kept-pk 10×); the rotation keeps
  *    the part universe but shifts each copy's baskets, so distinct edges
  *    and per-part degree genuinely grow ~N× — the densification that
  *    stresses the O(√m) orientation bound and PageRank fan-in;
  *  - orders: the SAME l_orderkey shift as lineitem with o_custkey KEPT —
  *    the orders⋈lineitem join stays referentially intact at N× (a
  *    symlinked 1× orders would silently reduce q3/q5 to the copy-0 slice),
  *    while each customer's order history densifies N× — the adversarial
  *    direction for the TPC-H face (r6 verdict task 3).
  *
  * Untouched dimension tables are symlinked from the source dir so every
  * SparkEntry query runs against the replica dir unchanged.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val s = Tables.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val copies = s.range(factor).select(col("id").as("copy"))

    val docs = Tables.documents(s, src)
    val nDocs = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    docs.crossJoin(copies)
      .select((col("doc_id") + col("copy") * nDocs).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = Tables.embeddings(s, src)
    val nVecs = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    // keep the FULL schema (label included — q_ann_filtered needs it; the
    // 100x probe caught the dropped column)
    emb.crossJoin(copies)
      .select((col("vec_id") + col("copy") * nVecs).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // canonical BIGINT-nanos read — the replica file then carries one known
    // encoding (readers re-detect the type per file either way)
    val ev = Tables.eventsRawNanos(s, src)
    val nEv = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    ev.crossJoin(copies)
      .select((col("event_id") + col("copy") * nEv).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val li = Tables.lineitem(s, src)
    // shift constant from ORDERS (the orderkey superset — an orders-only key
    // above lineitem's max would otherwise collide across copies), shared by
    // both tables so the join stays referentially intact per copy
    val nOk = Tables.orders(s, src).agg(max(col("o_orderkey"))).head().getLong(0) + 1
    // rotate within the REAL part-key universe [1, maxPk]: a plain
    // `pk % (max+1)` emits key 0, which no part row has, breaking
    // part-dimension joins on the replica (r6 ADVICE)
    val maxPk = li.agg(max(col("l_partkey"))).head().getLong(0)
    li.crossJoin(copies)
      .select((Seq(
        (col("l_orderkey") + col("copy") * nOk).as("l_orderkey"),
        ((col("l_partkey") - 1 + col("copy") * 7919L) % maxPk + 1).as("l_partkey")) ++
        li.columns.filterNot(c => c == "l_orderkey" || c == "l_partkey").map(col)): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    val ord = Tables.orders(s, src)
    ord.crossJoin(copies)
      .select((Seq((col("o_orderkey") + col("copy") * nOk).as("o_orderkey")) ++
        ord.columns.filterNot(_ == "o_orderkey").map(col)): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val link = java.nio.file.Paths.get(s"$dst/$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$src/$t.parquet"))
    }
    System.err.println(s"[scaleup] wrote ${nDocs * factor} docs, " +
      s"${nVecs * factor} vecs, ${nEv * factor} events, ${factor}x lineitem to $dst")
    s.stop()
  }
}
