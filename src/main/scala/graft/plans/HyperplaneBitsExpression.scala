package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-bit projection kernel for random-hyperplane LSH: bit (p - from) of
  * the result is 1 iff `planes(p) . v >= 0`, for p in [from, until).
  * Serializable and small (32 x 64 longs = 16 KB), so it rides the task
  * binary directly — no broadcast ceremony needed.
  */
final class HyperplaneKernel(val planes: Array[Array[Long]], val from: Int, val until: Int)
    extends Serializable {
  def bits(v: ArrayData): Long = {
    var out = 0L
    var p = from
    while (p < until) {
      val w = planes(p)
      var acc = 0L
      var i = 0
      while (i < w.length) { acc += w(i) * v.getLong(i); i += 1 }
      if (acc >= 0) out |= 1L << (p - from)
      p += 1
    }
    out
  }
}

/** Native Catalyst expression computing the hyperplane bucket bits of a
  * milli-quantized embedding (array<bigint>) in one compiled pass.
  *
  * The declarative formulation (32 x `aggregate(zip_with(...))` higher-order
  * functions over 64-element literal arrays) is semantically identical but
  * is CodegenFallback — a ~2k-node tree interpreted per row, re-evaluated on
  * every plan branch. This expression inlines to a tight loop inside
  * whole-stage codegen, which is what the LSH bucketing needs on the 100 TB
  * path where every vector is hashed exactly once per side of a join.
  */
case class HyperplaneBits(child: Expression, kernel: HyperplaneKernel)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(v: Any): Any = kernel.bits(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("hyperplaneKernel", kernel, classOf[HyperplaneKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.bits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {
  def apply(v: Column, planes: Array[Array[Long]], from: Int, until: Int): Column =
    GraftColumnBridge.column(HyperplaneBits(
      GraftColumnBridge.expression(v), new HyperplaneKernel(planes, from, until)))
}

/** Exact integer inner product of two array<bigint> columns — the
  * per-candidate kernel of every embedding similarity join. Same rationale
  * as [[HyperplaneBits]]: `aggregate(zip_with(...))` is CodegenFallback;
  * this stays inside whole-stage codegen.
  */
case class LongDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val module = "graft.plans.LongDot$.MODULE$" // call the Scala object directly
    defineCodeGen(ctx, ev, (a, b) => s"$module.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LongDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
