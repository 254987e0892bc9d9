package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator: at most `k`
  * counters of bounded state per partial buffer, mergeable with the
  * summed error bound of the mergeable-summaries construction (merge =
  * sum counters, then subtract the (k+1)-th largest and drop ≤0).
  *
  * Guarantee (what q100 hash-checks): total undercount across any
  * reduce/merge tree is ≤ N/(k+1), so every item with true frequency
  * strictly above N/(k+1) is present in the final candidate set — no
  * false negatives above the threshold, regardless of partitioning or
  * merge order. That order-independence is exactly what a 100 TB
  * heavy-hitter pass needs: partial sketches combine associatively at
  * O(k) shuffle bytes per partition, where an exact groupBy would move
  * every distinct key.
  */
class MisraGries(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {

  private def shrink(m: Map[Long, Long]): Map[Long, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything; at least
      // one entry zeroes out, so the size drops to ≤ k
      val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (key, n) if n > d => key -> (n - d) }
    }

  override def zero: Map[Long, Long] = Map.empty
  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    if (buf.contains(x) || buf.size < k)
      buf.updated(x, buf.getOrElse(x, 0L) + 1L)
    else
      // new key into a full buffer: the (k+1)-th largest of the would-be
      // k+1 counts is exactly 1 (the new key's own count, all others ≥1),
      // so the shrink degenerates to a uniform decrement — O(k), no sort,
      // and the new key never lands. Same output as shrink(updated(...)).
      buf.collect { case (key, n) if n > 1 => key -> (n - 1L) }
  override def merge(a: Map[Long, Long], b: Map[Long, Long])
      : Map[Long, Long] =
    shrink(b.foldLeft(a) { case (m, (key, n)) =>
      m.updated(key, m.getOrElse(key, 0L) + n)
    })
  override def finish(buf: Map[Long, Long]): Seq[Long] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
