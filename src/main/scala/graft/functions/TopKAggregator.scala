package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate. */
case class Scored(id: Long, score: Double)

/** Typed top-k aggregator: keeps the k best (score desc, id asc) rows per
  * group with bounded state. `extract` projects the input row to its
  * (id, score) pair so any row shape can feed it.
  *
  * The window-rank formulation (`row_number().over(partitionBy(g).orderBy
  * (score))` then `rn <= k`) shuffles and SORTS every row of every group;
  * this Aggregator's partial buffers carry at most k entries per group per
  * partition, so the shuffle moves O(groups × k) rows instead of
  * O(all rows) — the difference between a full sort and a bounded merge at
  * 100 TB. Ties break on id ascending, keeping results deterministic and
  * oracle-comparable. */
class TopKByScore[I](k: Int, extract: I => Scored)
    extends Aggregator[I, List[Scored], Seq[Long]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: List[Scored]): List[Scored] =
    xs.sortWith(better).take(k)

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], in: I): List[Scored] =
    trim(extract(in) :: buf)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    trim(a ++ b)
  override def finish(buf: List[Scored]): Seq[Long] =
    buf.sortWith(better).map(_.id)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopKByScore {
  def apply[I](k: Int, extract: I => Scored): TopKByScore[I] =
    new TopKByScore(k, extract)
}
