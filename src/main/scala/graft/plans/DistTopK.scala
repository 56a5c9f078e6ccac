package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k smallest (d, pid) pairs in ascending
  * (d, pid) order — the tie rule of the kNN window it replaces — plus the
  * TOTAL number of rows seen (the certification needs candidate counts).
  * k is tiny (3-5), so sorted insertion is the fastest shape.
  */
final class TopKBuf(val k: Int) {
  var n: Long = 0L
  var size: Int = 0
  val ds = new Array[Double](k)
  val ps = new Array[Long](k)

  private def before(d: Double, p: Long, i: Int): Boolean =
    d < ds(i) || (d == ds(i) && p < ps(i))

  def insert(d: Double, p: Long): Unit = {
    n += 1
    if (size == k && !before(d, p, k - 1)) return
    var i = (if (size < k) { size += 1; size } else k) - 2
    while (i >= 0 && before(d, p, i)) {
      ds(i + 1) = ds(i); ps(i + 1) = ps(i); i -= 1
    }
    ds(i + 1) = d; ps(i + 1) = p
  }

  def absorb(o: TopKBuf): Unit = {
    val extra = o.n - o.size
    var i = 0
    while (i < o.size) { insert(o.ds(i), o.ps(i)); i += 1 }
    n += extra
  }
}

/** k-nearest top-k as a TYPED IMPERATIVE AGGREGATE — the scale-shaped
  * replacement for `row_number().over(partitionBy(qid).orderBy(d, pid))
  * .filter(rk <= k)`: the window formulation shuffles and SORTS every
  * pass-1 candidate row; this aggregate keeps a k-slot insertion buffer
  * per query, combines map-side (partial ObjectHashAggregate), and ships
  * only k-sized buffers through the exchange. Output:
  * struct(n = total candidates seen, items = the k smallest (d, pid) in
  * ascending (d, pid) order) — exactly the window's output plus the
  * candidate count the certification pass needs, in one operator.
  */
case class DistTopK(
    dist: Expression,
    pid: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(dist, pid)
  override def nullable: Boolean = false
  override def prettyName: String = "dist_topk"

  private val itemType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("pid", LongType, nullable = false)))
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val d = dist.eval(input)
    val p = pid.eval(input)
    if (d != null && p != null)
      buf.insert(d.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val items = Array.tabulate[Any](buf.size) { i =>
      new GenericInternalRow(Array[Any](buf.ds(i), buf.ps(i)))
    }
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(items)))
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 16 * buf.size)
    bb.putInt(buf.k).putLong(buf.n).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.ds(i)); bb.putLong(buf.ps(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt)
    val n = bb.getLong
    val size = bb.getInt
    var i = 0
    while (i < size) { buf.ds(i) = bb.getDouble; buf.ps(i) = bb.getLong; i += 1 }
    buf.size = size
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), pid = newChildren(1))
}

object DistTopK {
  /** struct(n, items[1..k](d, pid)) aggregate column over (dist, pid). */
  def apply(dist: Column, pid: Column, k: Int): Column =
    GraftColumnBridge.column(
      DistTopK(GraftColumnBridge.expression(dist), GraftColumnBridge.expression(pid), k)
        .toAggregateExpression())
}
