package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen wrappers for the spatial cell encoders — the last
  * interpreted kernels in oracle-gated paths (round 3 ran these as Scala
  * UDFs, which box each row and break whole-stage codegen). The generated
  * code calls the encoders' static forwarders directly: no reference
  * objects, nothing extra serialized into the task binary.
  */

/** H3-style hex cell id (graft.operators.HexCells.encode) at a fixed res. */
case class HexCellId(left: Expression, right: Expression, res: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_cell"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.operators.HexCells.encode(lon.asInstanceOf[Int], lat.asInstanceOf[Int], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.operators.HexCells.encode($lon, $lat, $res)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** S2-style Hilbert cell id (graft.operators.HilbertCells.encode). */
case class HilbertCellId(left: Expression, right: Expression, res: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_cell"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.operators.HilbertCells.encode(lon.asInstanceOf[Int], lat.asInstanceOf[Int], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.operators.HilbertCells.encode($lon, $lat, $res)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All packed hex cell ids at hex distance <= maxD from the point's cell —
  * the kNN ring-expansion probe list (graft.operators.HexCells.probes) as a
  * primitive long array, zero boxing.
  */
case class HexProbes(left: Expression, right: Expression, res: Int, maxD: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hex_probes"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.operators.HexCells.probes(lon.asInstanceOf[Int], lat.asInstanceOf[Int], res, maxD))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.operators.HexCells.probes($lon, $lat, $res, $maxD))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Z-order (Morton) cell id — the data-layout key (graft.operators.ZCells):
  * rows sorted by it cluster spatially, and a bbox scan reduces to a few
  * contiguous id ranges.
  */
case class MortonCellId(left: Expression, right: Expression, res: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_cell_id"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.operators.ZCells.encode(lon.asInstanceOf[Int], lat.asInstanceOf[Int], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.operators.ZCells.encode($lon, $lat, $res)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CellId {
  def hex(lon: Column, lat: Column, res: Int): Column =
    GraftColumnBridge.column(HexCellId(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), res))

  def morton(lon: Column, lat: Column, res: Int): Column =
    GraftColumnBridge.column(MortonCellId(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), res))

  def hilbert(lon: Column, lat: Column, res: Int): Column =
    GraftColumnBridge.column(HilbertCellId(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), res))

  def hexProbes(lon: Column, lat: Column, res: Int, maxD: Int): Column =
    GraftColumnBridge.column(HexProbes(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), res, maxD))
}
