package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Sum of squares of a bigint column as a DeclarativeAggregate: the
  * buffer update/merge are pure Catalyst expressions, so the whole
  * aggregate stays inside whole-stage codegen (no typed row <-> object
  * conversion like an Aggregator, no imperative buffer like
  * TypedImperativeAggregate). Partial+final aggregation falls out for
  * free — map-side partials ship one long per group.
  *
  * Used by q56: integer moments (sum, sum of squares) are
  * order-independent, so exact group variance is differential-safe where
  * a floating sum would not be. */
case class SumOfSquaresLong(child: Expression)
    extends DeclarativeAggregate {

  private lazy val acc = AttributeReference("acc", LongType)()

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    acc + child * child)
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    acc.left + acc.right)
  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumOfSquaresLong =
    copy(child = newChildren.head)
}
