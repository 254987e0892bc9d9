package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k minimum values) distinct-count sketch as a typed Aggregator:
  * state = the k smallest DISTINCT hash values seen, kept sorted. Insert
  * and merge are order-independent (min-k of a union is the min-k of
  * min-k's — the mergeable-summaries property), so partial buffers
  * combine associatively at O(k) shuffle bytes per partition — the same
  * scale argument as [[MisraGries]], for cardinality instead of
  * frequency. With a DETERMINISTIC hash the final state is a pure
  * function of the input multiset, which is what lets a DuckDB oracle
  * reproduce the sketch exactly (q181's batch convention, here made
  * streaming-capable: the buffer is exactly the state a streaming
  * aggregation carries per window).
  */
class KmvMin(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.contains(x)) buf
    else if (buf.size < k) (buf :+ x).sorted
    else if (x < buf.last) (buf.init :+ x).sorted
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
