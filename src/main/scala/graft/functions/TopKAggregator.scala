package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for exact per-group top-k — the third implementation
  * tier for top-k in this engine (SURVEY.md §2.9):
  *
  *  1. `TakeOrderedAndProject` (global order+limit — `q_posts_latest30`);
  *  2. salted two-stage `row_number` windows (per-group, sort-based —
  *     `Similarity.topKPerQuery`);
  *  3. this `Aggregator`: a bounded k-element buffer with map-side partial
  *     aggregation — per-group top-k in ONE shuffle of at most k rows per
  *     (partition, group), no sort of the full group, no spill. The shape to
  *     reach for when groups are huge and k is small (the 100 TB regime).
  *
  * Ordering matches the window implementations exactly: score descending,
  * then id ascending as the tie-break — so results are interchangeable
  * (asserted in `TopKAggregatorSpec`).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  // buffer: worst-last list of (score, id), never longer than k
  override def zero: List[(Double, Long)] = Nil

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    val (front, back) = buf.span(better(_, e))
    val merged = front ::: e :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] = {
    val e = (in._2, in._1)
    if (buf.length == k && better(buf.last, e)) buf else insert(buf, e)
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)((acc, e) => if (acc.length == k && better(acc.last, e)) acc else insert(acc, e))

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
