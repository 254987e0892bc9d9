package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass second-moment census over fixed-width integer vectors: for a
  * column of `array<bigint>` of declared width `d`, accumulates
  *
  *   buf = [ n,  s_0..s_{d-1},  g_{0,0}, g_{0,1}, .., g_{0,d-1},
  *           g_{1,1}, .., g_{d-1,d-1} ]
  *
  * i.e. the row count, the per-dimension sums, and the upper-triangle
  * outer-product sums g_{i,j} = Σ_v v_i·v_j (row-major upper triangle,
  * d(d+1)/2 cells), emitted as one `array<bigint>` of length
  * 1 + d + d(d+1)/2.
  *
  * Why it exists (optimization guide §2.3/§4): the previous form of the
  * Gram-matrix family (q154/q315/q344 and the q351/q450 census) exploded
  * d(d+1)/2 = 2080 structs PER VECTOR through an interpreted
  * higher-order-function `transform`, shuffling n·2080 rows into a
  * hash aggregate. This aggregate keeps the same integer sums — Java
  * `long` addition here wraps exactly like Spark's `Sum(LongType)`
  * codegen, and integer addition is associative/commutative, so every
  * cell is bit-identical regardless of partitioning — while shuffling
  * ONE 2145-long buffer per map partition (the mergeable-moments
  * discipline q94/q154's scaladoc already claims, now realized in the
  * physical plan too). GramMomentsSpec pins equality against the old
  * explode+groupBy form.
  */
case class GramMomentsAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val bufLen = 1 + d + d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // Width guard: getLong(i) on an UnsafeArrayData does NOT bounds-
      // check, so a vector shorter than the declared width would read
      // garbage words silently (the replaced element_at form returned
      // null and skipped). Fail loudly instead.
      require(arr.numElements() >= d,
        s"gram_moments: input vector has ${arr.numElements()} elements, " +
          s"declared width is $d")
      buf(0) += 1L
      var i = 0
      var idx = 1 + d
      while (i < d) {
        val vi = arr.getLong(i)
        buf(1 + i) += vi
        var j = i
        while (j < d) {
          buf(idx) += vi * arr.getLong(j)
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMomentsAgg =
    copy(child = newChildren.head)
}
