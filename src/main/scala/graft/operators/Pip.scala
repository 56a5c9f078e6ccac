package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
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

/** Ray-cast containment kernel over edge-list ARRAY COLUMNS — the refine of
  * the many-polygon PIP JOIN, where the polygon set is a DataFrame column
  * (no 63-polygon bitmap cap, no broadcast/driver structure). Exactly the
  * crossing-parity rule of Geo.pointInPolygon (reference Point.java:19-36),
  * reading ArrayData in place (no per-row heap-array copy). Top-level object
  * (no companion class) so Scala emits static forwarders the generated Java
  * can call directly.
  */
object PipKernels {

  /** Sign of the cross product (b-a) x (c-a), EXACT at any planar
    * magnitude: coordinate deltas can reach 3.6e9 (two continent-sized
    * rings meeting in one coarse cell), whose product overflows Int64, so
    * the two products are compared as signed 128-bit values
    * (Math.multiplyHigh + unsigned-low tiebreak) — matching the DuckDB
    * oracle's HUGEINT arithmetic without its allocation.
    */
  private[graft] def orientSign(ax: Long, ay: Long, bx: Long, by: Long,
      cx: Long, cy: Long): Int = {
    val p = bx - ax; val q = cy - ay
    val r = by - ay; val s = cx - ax
    val hi1 = Math.multiplyHigh(p, q); val lo1 = p * q
    val hi2 = Math.multiplyHigh(r, s); val lo2 = r * s
    if (hi1 != hi2) { if (hi1 > hi2) 1 else -1 }
    else java.lang.Long.compareUnsigned(lo1, lo2).signum
  }

  private def between(v: Long, a: Long, b: Long): Boolean =
    v >= math.min(a, b) && v <= math.max(a, b)

  /** Segment AB touches/crosses segment CD: proper crossing (strict
    * opposite orientation signs on both sides) or an endpoint lying on the
    * other segment (orientation 0 + bbox). The exact rule the oracle SQL
    * replays.
    */
  def segTouch(ax: Long, ay: Long, bx: Long, by: Long,
      cx: Long, cy: Long, dx: Long, dy: Long): Boolean = {
    val o1 = orientSign(ax, ay, bx, by, cx, cy)
    val o2 = orientSign(ax, ay, bx, by, dx, dy)
    val o3 = orientSign(cx, cy, dx, dy, ax, ay)
    val o4 = orientSign(cx, cy, dx, dy, bx, by)
    (o1 * o2 < 0 && o3 * o4 < 0) ||
      (o1 == 0 && between(cx, ax, bx) && between(cy, ay, by)) ||
      (o2 == 0 && between(dx, ax, bx) && between(dy, ay, by)) ||
      (o3 == 0 && between(ax, cx, dx) && between(ay, cy, dy)) ||
      (o4 == 0 && between(bx, cx, dx) && between(by, cy, dy))
  }

  /** Two closed rings intersect: a boundary pair touches, or one ring's
    * first vertex lies inside the other (covers full containment — if no
    * boundaries touch and A ⊂ B then every vertex of A is inside B).
    */
  def polyIntersects(xa: ArrayData, ya: ArrayData,
      xb: ArrayData, yb: ArrayData): Boolean = {
    val na = xa.numElements() - 1
    val nb = xb.numElements() - 1
    var i = 0
    while (i < na) {
      var j = 0
      while (j < nb) {
        if (segTouch(xa.getInt(i), ya.getInt(i), xa.getInt(i + 1), ya.getInt(i + 1),
            xb.getInt(j), yb.getInt(j), xb.getInt(j + 1), yb.getInt(j + 1)))
          return true
        j += 1
      }
      i += 1
    }
    contains(xb.getInt(0), yb.getInt(0), xa, ya) ||
      contains(xa.getInt(0), ya.getInt(0), xb, yb)
  }

  def contains(lon: Int, lat: Int, xs: ArrayData, ys: ArrayData): Boolean = {
    var inside = false
    var i = 0
    val n = xs.numElements() - 1
    while (i < n) {
      val x1 = xs.getInt(i).toLong
      val y1 = ys.getInt(i).toLong
      val x2 = xs.getInt(i + 1).toLong
      val y2 = ys.getInt(i + 1).toLong
      // crossing iff (y1<=lat) == (lat<y2); Java truncating long division.
      // Overflow headroom: coordinates live in the pinned planar domain
      // (|lon| <= 1.8e9, |lat| <= 0.9e9), so (x2-x1)*(lat-y1) reaches at
      // most ~3.6e9 * 1.8e9 = 6.5e18 of the 9.2e18 Long max — reuse on a
      // wider coordinate domain would silently wrap; keep the domain.
      if (y1 != y2 && ((y1 <= lat) == (lat < y2)) &&
          x1 + (x2 - x1) * (lat - y1) / (y2 - y1) < lon)
        inside = !inside
      i += 1
    }
    inside
  }
}

/** `pip_contains(lon, lat, lons, lats)` — codegen containment test of a
  * point against an edge-list ring carried in array columns.
  */
case class PipContainsExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pip_contains"
  override def nullSafeEval(lon: Any, lat: Any, xs: Any, ys: Any): Any =
    PipKernels.contains(lon.asInstanceOf[Int], lat.asInstanceOf[Int],
      xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, xs, ys) =>
      s"graft.operators.PipKernels.contains($lon, $lat, $xs, $ys)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `poly_intersects(lonsA, latsA, lonsB, latsB)` — codegen ring-ring
  * intersection test (boundary touch or containment either way).
  */
case class PolyIntersectsExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "poly_intersects"
  override def nullSafeEval(xa: Any, ya: Any, xb: Any, yb: Any): Any =
    PipKernels.polyIntersects(xa.asInstanceOf[ArrayData], ya.asInstanceOf[ArrayData],
      xb.asInstanceOf[ArrayData], yb.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xa, ya, xb, yb) =>
      s"graft.operators.PipKernels.polyIntersects($xa, $ya, $xb, $yb)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object Pip {
  def mask(lon: Column, lat: Column, set: PipSet): Column =
    GraftColumnBridge.column(PipMaskExpr(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat), set))

  def contains(lon: Column, lat: Column, lons: Column, lats: Column): Column =
    GraftColumnBridge.column(PipContainsExpr(
      GraftColumnBridge.expression(lon), GraftColumnBridge.expression(lat),
      GraftColumnBridge.expression(lons), GraftColumnBridge.expression(lats)))

  /** Deterministic star-shaped polygons (no self-intersection): vertices on
    * a hash-jittered radius around a hash-placed center, closed ring. The
    * literal vertices are embedded in both the engine and the oracle SQL —
    * generation happens once, in Scala.
    */
  private def starPolygons(count: Int, seed: String, base: Double,
      nOf: Int => Int): Array[PreparedPolygon] = (0 until count).map { pid =>
    val cLon = (PortableHash.h60(s"$seed:$pid:lon") % 2400000001L - 1200000000L).toInt
    val cLat = (PortableHash.h60(s"$seed:$pid:lat") % 1200000001L - 600000000L).toInt
    val n = nOf(pid)
    val pts = (0 until n).map { i =>
      val r = base * (0.5 + (PortableHash.h60(s"$seed:$pid:r:$i") % 1000) / 1000.0)
      val a = 2.0 * math.Pi * i / n
      ((cLon + r * math.cos(a)).toInt, (cLat + 0.5 * r * math.sin(a)).toInt)
    }
    val ring = pts :+ pts.head
    PreparedPolygon(pid, ring.map(_._1).toArray, ring.map(_._2).toArray)
  }.toArray

  /** The fixture polygon set of the bitmask path (g_pip). */
  lazy val fixturePolygons: Array[PreparedPolygon] =
    starPolygons(5, "poly", 150000000.0, pid => 7 + pid)

  lazy val fixtureSet: PipSet = new PipSet(fixturePolygons)

  /** 96 deterministic polygons — deliberately ABOVE the 63-polygon bitmap
    * cap of PipSet, so only the join path can serve them. Smaller radius
    * (~6 deg) keeps each polygon's covered-cell fan-out small relative to
    * [[ManyCellSide]].
    */
  lazy val manyPolygons: Array[PreparedPolygon] =
    starPolygons(96, "mpoly", 60000000.0, pid => 7 + pid % 9)

  /** Grid cell side of the many-polygon join: 10 deg in 1e-7 fixed point —
    * a few polygon bboxes per cell, 24x12 cells over the planar domain.
    */
  val ManyCellSide = 100000000L

  /** Bench-only fixture: 10k small polygons (~1.2 deg) — the polygon-count
    * scale dimension the 96-ring gate can't show. */
  lazy val benchPolygons: Array[PreparedPolygon] =
    starPolygons(10000, "bpoly", 12000000.0, pid => 7 + pid % 5)

  /** Base cell for the 10k-polygon bench join (~1.6 deg: most polygons at
    * level 0-1). */
  val BenchCellSide = 16000000L

  def polyDf(spark: SparkSession, polys: Array[PreparedPolygon]): DataFrame = {
    import spark.implicits._
    polys.toSeq.map(p => (p.id, p.lon.toSeq, p.lat.toSeq)).toDF("pid", "lons", "lats")
  }

  /** Polygons annotated with their grid LEVEL and exploded to the covered
    * cells at that level. lvl = smallest L with baseCell·2^L ≥ the bbox
    * span, so every polygon covers a BOUNDED number of cells (≤ 2 per axis
    * at exact level; ≤ 3 if the float log underestimates — benign, the
    * sequence() range still covers). This is what keeps the join safe for
    * heterogeneous polygon sets: a continent-sized ring registers in ≤ 9
    * coarse cells instead of fanning out to (span/cell)² fine ones.
    */
  private[graft] def polyCells(polys: DataFrame, baseCell: Long): DataFrame =
    polys
      .withColumn("spanMax", greatest(
        expr("cast(array_max(lons) as long) - array_min(lons)"),
        expr("cast(array_max(lats) as long) - array_min(lats)"), lit(1L)))
      .withColumn("lvl", greatest(lit(0),
        ceil(log(2.0, col("spanMax").cast("double") / baseCell)).cast("int")))
      .withColumn("side", expr(s"shiftleft(${baseCell}L, lvl)"))
      .withColumn("cx", explode(sequence(
        expr("array_min(lons) div side"),
        expr("array_max(lons) div side"))))
      .withColumn("cy", explode(sequence(
        expr("array_min(lats) div side"),
        expr("array_max(lats) div side"))))
      .drop("spanMax", "side")

  /** Many-polygon PIP JOIN — (point id, polygon id) pairs for every polygon
    * containing the point. The polygon side is a DATAFRAME of closed edge
    * rings: no bitmap cap, no driver-resident index, no broadcast
    * requirement — at 10^6 polygons the build side shuffles like any table.
    *
    * Hierarchical grid blocking: each polygon registers at the level
    * matching ITS OWN size (≤ 9 cells, see [[polyCells]]); each point maps
    * to ONE cell per DISTINCT LEVEL present in the polygon set (a tiny
    * broadcast — fan-out = number of distinct levels, ≤ ~32 ever), and
    * candidates meet in a shuffle EQUI-join on (lvl, cx, cy). Truncating
    * `div` (= DuckDB `//`) is monotone, so a polygon's cell range covers
    * every cell a contained point can map to at that level; a point has
    * exactly one cell per level, so no pair is emitted twice. The codegen
    * ray-cast refine runs only on same-cell candidates. At 100 TB: the
    * 10^12-row point side fans out only by the level count, per-cell work
    * tracks local polygon density, dense metro cells split under AQE skew
    * handling, and no polygon — however large — can degenerate the
    * explode.
    */
  def pipJoin(points: DataFrame, polys: DataFrame, baseCell: Long): DataFrame = {
    val pol = polyCells(polys, baseCell)
    // the level fan-out is a deliberate broadcast nested loop over a
    // bounded tiny build side (<= ~32 distinct levels can ever exist);
    // the CANDIDATE join below stays a (lvl, cx, cy) equi-join —
    // PipJoinSpec pins both plan shapes
    val levels = pol.select("lvl").distinct()
    val pts = points
      .join(broadcast(levels))
      .withColumn("cx", expr(s"cast(lon as long) div shiftleft(${baseCell}L, lvl)"))
      .withColumn("cy", expr(s"cast(lat as long) div shiftleft(${baseCell}L, lvl)"))
    pts.join(pol, Seq("lvl", "cx", "cy"))
      .filter(Pip.contains(col("lon").cast("int"), col("lat").cast("int"),
        col("lons"), col("lats")))
      .drop("lvl", "cx", "cy", "lons", "lats")
  }

  def intersects(lonsA: Column, latsA: Column, lonsB: Column, latsB: Column): Column =
    GraftColumnBridge.column(PolyIntersectsExpr(
      GraftColumnBridge.expression(lonsA), GraftColumnBridge.expression(latsA),
      GraftColumnBridge.expression(lonsB), GraftColumnBridge.expression(latsB)))

  /** Polygon-overlap SELF-join — all pairs of intersecting polygons
    * (boundary touch or containment either way). With distJoin
    * (point-point) and pipJoin (point-polygon) this completes the spatial
    * join trio.
    *
    * Hierarchical blocking (the pipJoin scheme extended to two ring
    * sides): every polygon REGISTERS at the level matching its own size
    * (≤ 9 cells — a continent-sized ring cannot degenerate the explode)
    * and PROBES its bbox cells at every distinct level ≥ its own (≤ 4
    * cells per level, ≤ ~32 levels ever). A pair (A, B) with
    * lvl(A) ≤ lvl(B) meets exactly where A probes B's registration level,
    * so each pair meets at ONE level; within it, the pair is emitted only
    * from the canonical cell — the max-of-bbox-mins cell, always common
    * to both bbox ranges — and same-level pairs additionally order by pid
    * (both orientations exist only there). No dedup shuffle, never a
    * cartesian; the codegen refine tests boundary touches exactly
    * (integer orientation signs) plus first-vertex containment.
    */
  def polyOverlapJoin(polys: DataFrame, baseCell: Long): DataFrame = {
    val withMeta = polys
      .withColumn("minx", expr("cast(array_min(lons) as long)"))
      .withColumn("maxx", expr("cast(array_max(lons) as long)"))
      .withColumn("miny", expr("cast(array_min(lats) as long)"))
      .withColumn("maxy", expr("cast(array_max(lats) as long)"))
      .withColumn("spanMax", greatest(
        col("maxx") - col("minx"), col("maxy") - col("miny"), lit(1L)))
      .withColumn("lvlOwn", greatest(lit(0),
        ceil(log(2.0, col("spanMax").cast("double") / baseCell)).cast("int")))
    val reg = withMeta
      .withColumn("side", expr(s"shiftleft(${baseCell}L, lvlOwn)"))
      .withColumn("cx", explode(sequence(expr("minx div side"), expr("maxx div side"))))
      .withColumn("cy", explode(sequence(expr("miny div side"), expr("maxy div side"))))
      .select(col("lvlOwn").as("lvl"), col("cx"), col("cy"),
        col("pid").as("pid_r"), col("lons").as("lons_r"), col("lats").as("lats_r"),
        col("minx").as("minx_r"), col("miny").as("miny_r"))
    val levels = withMeta.select(col("lvlOwn").as("lvl")).distinct()
    val probe = withMeta
      .join(broadcast(levels), col("lvl") >= col("lvlOwn"))
      .withColumn("side", expr(s"shiftleft(${baseCell}L, lvl)"))
      .withColumn("cx", explode(sequence(expr("minx div side"), expr("maxx div side"))))
      .withColumn("cy", explode(sequence(expr("miny div side"), expr("maxy div side"))))
      .select(col("lvl"), col("cx"), col("cy"), col("lvlOwn").as("lvlOwn_p"),
        col("pid").as("pid_p"), col("lons").as("lons_p"), col("lats").as("lats_p"),
        col("minx").as("minx_p"), col("miny").as("miny_p"))
    probe.join(reg, Seq("lvl", "cx", "cy"))
      .filter(col("pid_p") =!= col("pid_r"))
      .filter(col("lvlOwn_p") < col("lvl") || col("pid_p") < col("pid_r"))
      .filter(col("cx") === expr(s"greatest(minx_p, minx_r) div shiftleft(${baseCell}L, lvl)") &&
        col("cy") === expr(s"greatest(miny_p, miny_r) div shiftleft(${baseCell}L, lvl)"))
      .filter(intersects(col("lons_p"), col("lats_p"), col("lons_r"), col("lats_r")))
      .select(least(col("pid_p"), col("pid_r")).cast("long").as("pid_a"),
        greatest(col("pid_p"), col("pid_r")).cast("long").as("pid_b"))
  }

  /** DuckDB oracle of the polygon-overlap self-join: all-pairs edge-touch
    * test (HUGEINT orientation cross products, the engine's exact rule)
    * UNION first-vertex crossing-parity containment — no blocking, no
    * shared algorithm shape.
    */
  def polyOverlapDuckSql(): String = {
    val edges = manyPolygons.flatMap { p =>
      (0 until p.lon.length - 1).map { i =>
        s"(${p.id}, ${p.lon(i)}, ${p.lat(i)}, ${p.lon(i + 1)}, ${p.lat(i + 1)})"
      }
    }.mkString(", ")
    val verts = manyPolygons.map(p => s"(${p.id}, ${p.lon(0)}, ${p.lat(0)})").mkString(", ")
    val truncDiv = "((CAST(e.x2 AS BIGINT)-e.x1)*(CAST(v.vy AS BIGINT)-e.y1) // (CAST(e.y2 AS BIGINT)-e.y1))"
    // every coordinate difference is widened BEFORE subtraction (DuckDB
    // VALUES columns are INT32; planar deltas can reach 2.9e9)
    def d(p: String, q: String) = s"(CAST($p AS HUGEINT)-$q)"
    val o1 = s"${d("a.x2", "a.x1")}*${d("b.y1", "a.y1")} - ${d("a.y2", "a.y1")}*${d("b.x1", "a.x1")}"
    val o2 = s"${d("a.x2", "a.x1")}*${d("b.y2", "a.y1")} - ${d("a.y2", "a.y1")}*${d("b.x2", "a.x1")}"
    val o3 = s"${d("b.x2", "b.x1")}*${d("a.y1", "b.y1")} - ${d("b.y2", "b.y1")}*${d("a.x1", "b.x1")}"
    val o4 = s"${d("b.x2", "b.x1")}*${d("a.y2", "b.y1")} - ${d("b.y2", "b.y1")}*${d("a.x2", "b.x1")}"
    s"""WITH e AS (SELECT * FROM (VALUES $edges) AS t(pid, x1, y1, x2, y2)),
       |v AS (SELECT * FROM (VALUES $verts) AS t(pid, vx, vy)),
       |o AS (
       |  SELECT a.pid AS pa, b.pid AS pb,
       |    $o1 AS o1,
       |    $o2 AS o2,
       |    $o3 AS o3,
       |    $o4 AS o4,
       |    a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
       |    b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2
       |  FROM e a JOIN e b ON a.pid < b.pid),
       |touch AS (
       |  SELECT DISTINCT pa, pb FROM o
       |  WHERE (o1*o2 < 0 AND o3*o4 < 0)
       |     OR (o1 = 0 AND bx1 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
       |               AND by1 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
       |     OR (o2 = 0 AND bx2 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
       |               AND by2 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
       |     OR (o3 = 0 AND ax1 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
       |               AND ay1 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))
       |     OR (o4 = 0 AND ax2 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
       |               AND ay2 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))),
       |cont AS (
       |  SELECT LEAST(v.pid, e.pid) AS pa, GREATEST(v.pid, e.pid) AS pb
       |  FROM v JOIN e ON e.pid <> v.pid
       |   AND e.y1 <> e.y2 AND ((e.y1 <= v.vy) = (v.vy < e.y2))
       |   AND e.x1 + $truncDiv < v.vx
       |  GROUP BY v.pid, e.pid HAVING COUNT(*) % 2 = 1)
       |SELECT DISTINCT CAST(pa AS BIGINT) AS pid_a, CAST(pb AS BIGINT) AS pid_b
       |FROM (SELECT pa, pb FROM touch UNION ALL SELECT pa, pb FROM cont) u
       |ORDER BY pid_a, pid_b""".stripMargin
  }

  /** DuckDB oracle of the many-polygon join: brute-force crossing-parity
    * over a literal edge table (no blocking — engine and oracle share no
    * algorithm beyond the parity rule itself).
    */
  def pipJoinDuckSql(fromImg: String): String = {
    val edges = manyPolygons.flatMap { p =>
      (0 until p.lon.length - 1).map { i =>
        s"(${p.id}, ${p.lon(i)}, ${p.lat(i)}, ${p.lon(i + 1)}, ${p.lat(i + 1)})"
      }
    }.mkString(", ")
    val truncDiv = "((CAST(e.x2 AS BIGINT)-e.x1)*(CAST(p.lat AS BIGINT)-e.y1) // (CAST(e.y2 AS BIGINT)-e.y1))"
    s"""SELECT image_id, CAST(pid AS BIGINT) AS pid FROM (
       |  SELECT p.image_id, e.pid, COUNT(*) AS cr
       |  FROM $fromImg p
       |  JOIN (SELECT * FROM (VALUES $edges) AS t(pid, x1, y1, x2, y2)) e
       |    ON e.y1 <> e.y2
       |   AND ((e.y1 <= p.lat) = (p.lat < e.y2))
       |   AND e.x1 + $truncDiv < p.lon
       |  GROUP BY p.image_id, e.pid) c
       |WHERE cr % 2 = 1
       |ORDER BY image_id, pid""".stripMargin
  }

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
