package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import graft.core.{Bbox, Geo, PortableHash}

/** A polygon prepared for repeated point-in-polygon tests: bbox pretest +
  * dense edge arrays (the "prepared-geometry edge list" form; the kernel is
  * the reference's ray-casting rule, Point.java:19-36).
  */
final case class PreparedPolygon(id: Int, lon: Array[Int], lat: Array[Int]) extends Serializable {
  val bbox: Bbox = Bbox(lon.min, lat.min, lon.max, lat.max)
  def contains(x: Int, y: Int): Boolean =
    bbox.contains(x, y) && Geo.pointInPolygon(x, y, lon, lat)
}

/** A fixed polygon set with a uniform cell index: each cell holds the ids of
  * polygons whose bbox intersects it, so a point tests only local candidates.
  * With thousands of polygons this is the scale path (candidates-per-cell is
  * O(local density), not O(total)); the mask loop itself is branch-light and
  * codegen-friendly.
  */
final class PipSet(val polys: Array[PreparedPolygon], gx: Int = 256, gy: Int = 128)
    extends Serializable {
  require(polys.length <= 63, "mask is a 64-bit bitmap")
  private val spanLon = Geo.MaxLon.toLong - Geo.MinLon
  private val spanLat = Geo.MaxLat.toLong - Geo.MinLat
  private def ix(lon: Int): Int = {
    val i = ((lon.toLong - Geo.MinLon) * gx / spanLon).toInt
    if (i < 0) 0 else if (i >= gx) gx - 1 else i
  }
  private def iy(lat: Int): Int = {
    val i = ((lat.toLong - Geo.MinLat) * gy / spanLat).toInt
    if (i < 0) 0 else if (i >= gy) gy - 1 else i
  }
  private val cacheKey: String = java.util.UUID.randomUUID().toString
  // built once per executor JVM; only the polygons ride the task binary
  @transient private lazy val cells: Array[Array[Int]] =
    PipSet.cache.computeIfAbsent(cacheKey, _ => build())

  private def build(): Array[Array[Int]] = {
    val buf = Array.fill(gx * gy)(new scala.collection.mutable.ArrayBuffer[Int](4))
    for (p <- polys) {
      val x0 = ix(p.bbox.minLon); val x1 = ix(p.bbox.maxLon)
      val y0 = iy(p.bbox.minLat); val y1 = iy(p.bbox.maxLat)
      var cy = y0
      while (cy <= y1) {
        var cx = x0
        while (cx <= x1) { buf(cy * gx + cx) += p.id; cx += 1 }
        cy += 1
      }
    }
    buf.map(_.toArray)
  }

  /** Bitmask of polygons containing the point. */
  def mask(lon: Int, lat: Int): Long = {
    val cand = cells(iy(lat) * gx + ix(lon))
    var m = 0L
    var i = 0
    while (i < cand.length) {
      val p = polys(cand(i))
      if (p.contains(lon, lat)) m |= (1L << p.id)
      i += 1
    }
    m
  }
}

object PipSet {
  private[operators] val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Int]]]()
}

case class PipMaskExpr(left: Expression, right: Expression, set: PipSet)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pip_mask"
  override def nullSafeEval(lon: Any, lat: Any): Any =
    set.mask(lon.asInstanceOf[Int], lat.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("pipSet", set, classOf[PipSet].getName)
    defineCodeGen(ctx, ev, (lon, lat) => s"$s.mask($lon, $lat)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Pip {
  def mask(lon: Column, lat: Column, set: PipSet): Column =
    GraftColumnBridge.column(PipMaskExpr(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), set))

  /** The fixture polygon set: deterministic star-shaped polygons (no
    * self-intersection) whose literal vertices are embedded in both the
    * engine and the oracle SQL — generation happens once, in Scala.
    */
  lazy val fixturePolygons: Array[PreparedPolygon] = (0 until 5).map { pid =>
    val cLon = (PortableHash.h60(s"poly:$pid:lon") % 2400000001L - 1200000000L).toInt
    val cLat = (PortableHash.h60(s"poly:$pid:lat") % 1200000001L - 600000000L).toInt
    val n = 7 + pid
    val base = 150000000.0
    val pts = (0 until n).map { i =>
      val r = base * (0.5 + (PortableHash.h60(s"poly:$pid:r:$i") % 1000) / 1000.0)
      val a = 2.0 * math.Pi * i / n
      ((cLon + r * math.cos(a)).toInt, (cLat + 0.5 * r * math.sin(a)).toInt)
    }
    val ring = pts :+ pts.head
    PreparedPolygon(pid, ring.map(_._1).toArray, ring.map(_._2).toArray)
  }.toArray

  lazy val fixtureSet: PipSet = new PipSet(fixturePolygons)

  /** DuckDB SQL computing the same containment bitmask for (lon, lat)
    * columns of relation alias `p`, via crossing-parity aggregation over a
    * literal edge table. Java truncating division is emulated with
    * sign-corrected floor division.
    */
  def maskDuckSql(): String = {
    val edges = fixturePolygons.flatMap { p =>
      (0 until p.lon.length - 1).map { i =>
        s"(${p.id}, ${p.lon(i)}, ${p.lat(i)}, ${p.lon(i + 1)}, ${p.lat(i + 1)})"
      }
    }.mkString(", ")
    // DuckDB `//` truncates toward zero like Java's long division
    val truncDiv = "((CAST(e.x2 AS BIGINT)-e.x1)*(CAST(p.lat AS BIGINT)-e.y1) // (CAST(e.y2 AS BIGINT)-e.y1))"
    s"""(SELECT p.image_id, CAST(COALESCE(SUM(CASE WHEN c.crossings % 2 = 1 THEN CAST(POW(2, c.pid) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS mask
       | FROM img p
       | LEFT JOIN (
       |   SELECT p.image_id AS iid, e.pid, COUNT(*) AS crossings
       |   FROM img p
       |   JOIN (SELECT * FROM (VALUES $edges) AS t(pid, x1, y1, x2, y2)) e
       |     ON e.y1 <> e.y2
       |    AND ((e.y1 <= p.lat) = (p.lat < e.y2))
       |    AND e.x1 + $truncDiv < p.lon
       |   GROUP BY p.image_id, e.pid
       | ) c ON c.iid = p.image_id
       | GROUP BY p.image_id)""".stripMargin
  }
}
