package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running sum of array<bigint> vectors plus the row count. */
final class VecSumBuf(val dim: Int) {
  var cnt: Long = 0L
  val sums = new Array[Long](dim)

  def add(v: ArrayData): Unit = {
    cnt += 1
    var i = 0
    while (i < dim) { sums(i) += v.getLong(i); i += 1 }
  }

  def absorb(o: VecSumBuf): Unit = {
    cnt += o.cnt
    var i = 0
    while (i < dim) { sums(i) += o.sums(i); i += 1 }
  }
}

/** Per-group element-wise vector sum + count as a TYPED IMPERATIVE
  * AGGREGATE — the Lloyd centroid-update kernel. Replaces the former
  * `posexplode(v)` + `groupBy(j, d).agg(sum div count)` formulation, which
  * generated n*dim intermediate rows per update pass (12.8M at the bench's
  * 200k x 64-dim corpus) just to sum them back down: this aggregate
  * combines map-side into one dim-long buffer per cluster per partition
  * and ships k buffers through the exchange. Long addition is associative
  * and commutative, so the summed integers are identical to the exploded
  * formulation's in any partitioning. Output: struct(cnt, sums[dim]).
  */
case class VecSum(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] {

  require(dim >= 1, s"dim must be positive, got $dim")

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum"

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(dim)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = vec.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: VecSumBuf): Any =
    new GenericInternalRow(Array[Any](buf.cnt,
      new GenericArrayData(buf.sums.map(x => x: Any))))

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * buf.dim)
    bb.putInt(buf.dim).putLong(buf.cnt)
    var i = 0
    while (i < buf.dim) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuf(bb.getInt)
    buf.cnt = bb.getLong
    var i = 0
    while (i < buf.dim) { buf.sums(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object VecSum {
  /** struct(cnt, sums[dim]) aggregate column over an array<bigint> column. */
  def apply(vec: Column, dim: Int): Column =
    GraftColumnBridge.column(
      VecSum(GraftColumnBridge.expression(vec), dim).toAggregateExpression())
}
