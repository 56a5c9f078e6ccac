package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import graft.core.TileIndex

/** Native Catalyst expression computing the first-match tile id of a point.
  *
  * The semantics are the reference's order-sensitive first-match scan
  * (ChunkGenerator.java:549-556) — kept opaque inside one expression so no
  * Catalyst rewrite can reorder the match. Execution uses the cell-indexed
  * lookup ([[graft.core.TileIndex]]) and participates in whole-stage codegen
  * (the index rides the task binary via `addReferenceObj`, which Spark
  * broadcasts once per stage).
  */
case class TileIdPoint(left: Expression, right: Expression, index: TileIndex)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "tile_id"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    index.tileOfPoint(lon.asInstanceOf[Int], lat.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("tileIndex", index, classOf[TileIndex].getName)
    defineCodeGen(ctx, ev, (lon, lat) => s"$idx.tileOfPoint($lon, $lat)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** First tile whose bbox contains the whole rectangle — the all-vertex
  * containment rule for ways/areas (Bounds.java:63-80) reduced to the
  * element's bounding box.
  */
case class TileIdRect(children: Seq[Expression], index: TileIndex) extends Expression {
  require(children.length == 4, "tile_id_rect(minLon, minLat, maxLon, maxLat)")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "tile_id_rect"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else index.tileOfRect(graft.core.Bbox(
      vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("tileIndex", index, classOf[TileIndex].getName)
    val bbox = classOf[graft.core.Bbox].getName
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(g => s"${g.isNull}").mkString(" || ")
    val childCode = gens.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = false;
        int ${ev.value} = -1;
        if ($anyNull) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $idx.tileOfRect(new $bbox(
            ${gens(0).value}, ${gens(1).value}, ${gens(2).value}, ${gens(3).value}));
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object TileId {
  def point(lon: Column, lat: Column, index: TileIndex): Column =
    GraftColumnBridge.column(TileIdPoint(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), index))
  def rect(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column, index: TileIndex): Column =
    GraftColumnBridge.column(TileIdRect(
      Seq(minLon, minLat, maxLon, maxLat).map(GraftColumnBridge.expression), index))
}
