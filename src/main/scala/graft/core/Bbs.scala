package graft.core

import scala.collection.mutable.ArrayBuffer

/** One line of a bbs (tile geometry) config: either a fixed bbox
  * (4 numbers) or an iterated grid (6 numbers: lon from/to/step,
  * lat from/to/step). Reference: ChunkGenerator.java:53-97.
  */
final case class BbsRow(lonFrom: Long, lonTo: Long, lonStep: Long,
                        latFrom: Long, latTo: Long, latStep: Long) {
  def nLon: Int = (((lonTo - lonFrom) + lonStep - 1) / lonStep).toInt
  def nLat: Int = (((latTo - latFrom) + latStep - 1) / latStep).toInt
  def cellCount: Int = nLon * nLat
  def bbox: Bbox = Bbox(lonFrom.toInt, latFrom.toInt,
    (lonFrom + nLon.toLong * lonStep).toInt, (latFrom + nLat.toLong * latStep).toInt)
}

object Bbs {

  /** The default tile geometry: a latitude-banded grid (1 deg cells at the
    * equator widening towards the poles, polar caps as single boxes, plus a
    * coarse 10-deg overlay). Same shape as the reference's shipped
    * default.bbs; expansion semantics per ChunkGenerator.java:74-91.
    */
  val DefaultBbs: String =
    """-1800000000 1800000000 10000000 -450000000 450000000 10000000
      |-1800000000 1800000000 20000000 450000000 600000000 10000000
      |-1800000000 1800000000 20000000 -600000000 -450000000 10000000
      |-1800000000 1800000000 30000000 600000000 750000000 10000000
      |-1800000000 1800000000 30000000 -750000000 -600000000 10000000
      |-1800000000 1800000000 100000000 750000000 850000000 20000000
      |-1800000000 1800000000 100000000 -850000000 -750000000 20000000
      |-1800000000 1800000000 850000000 900000000
      |-1800000000 1800000000 -900000000 -850000000
      |-1800000000 1800000000 100000000 -800000000 800000000 100000000
      |""".stripMargin

  def parse(text: String): Vector[BbsRow] =
    text.linesIterator.filter(_.trim.nonEmpty).map { line =>
      val t = line.trim.split("\\s+").map(_.toLong)
      if (t.length == 6) BbsRow(t(0), t(1), t(2), t(3), t(4), t(5))
      else BbsRow(t(0), t(1), t(1) - t(0), t(2), t(3), t(3) - t(2))
    }.toVector

  /** Expand the grid rows into the flat, ordered bounds list: per row, lon
    * outer loop / lat inner loop with strict `<` upper bound; cells not
    * intersecting the input bbox are dropped; the whole-world catch-all is
    * appended last (ChunkGenerator.java:83-97).
    */
  def expand(rows: Vector[BbsRow], input: Bbox = Bbox.WholeWorld): Array[Bbox] = {
    val out = new ArrayBuffer[Bbox](45000)
    for (r <- rows) {
      var lon = r.lonFrom
      while (lon < r.lonTo) {
        var lat = r.latFrom
        while (lat < r.latTo) {
          val b = Bbox(lon.toInt, lat.toInt, (lon + r.lonStep).toInt, (lat + r.latStep).toInt)
          if (b.intersects(input)) out += b
          lat += r.latStep
        }
        lon += r.lonStep
      }
      lon += 0
    }
    out += Bbox.WholeWorld
    out.toArray
  }

  /** First-match tile id, linear-scan reference semantics
    * (ChunkGenerator.java:549-574): first bbox containing the point wins;
    * no match => bounds.length (the overflow tile).
    */
  def firstMatch(bounds: Array[Bbox], lon: Int, lat: Int): Int = {
    var i = 0
    while (i < bounds.length) {
      if (bounds(i).contains(lon, lat)) return i
      i += 1
    }
    bounds.length
  }

  def firstMatchRect(bounds: Array[Bbox], rect: Bbox): Int = {
    var i = 0
    while (i < bounds.length) {
      if (bounds(i).containsRect(rect)) return i
      i += 1
    }
    bounds.length
  }

  /** DuckDB SQL closed form of the first-match tile id of a point, for
    * oracle verification. Only valid when the input bbox is the whole world
    * (no cells dropped, so tile ids are the unfiltered file-order indices).
    *
    * Per family (bbs row), the first matching cell of a CONTAINED point is
    * the one with minimal lon index, then minimal lat index; because bounds
    * are closed, a point exactly on an interior grid line belongs to the
    * lower-index cell: i = max(0, ceil((v - from)/step) - 1). Families are
    * checked in file order (CASE arms), which equals global first-match
    * because every cell of family k precedes every cell of family k+1.
    */
  def firstMatchPointSql(rows: Vector[BbsRow], lonCol: String, latCol: String,
                         intDiv: (String, String) => String): String = {
    val sb = new StringBuilder("CASE")
    var offset = 0L
    for (r <- rows) {
      val cond = s"($lonCol >= ${r.lonFrom} AND $lonCol <= ${r.lonFrom + r.nLon.toLong * r.lonStep}" +
        s" AND $latCol >= ${r.latFrom} AND $latCol <= ${r.latFrom + r.nLat.toLong * r.latStep})"
      val il = s"GREATEST(0, ${intDiv(s"($lonCol - (${r.lonFrom}) + ${r.lonStep - 1})", r.lonStep.toString)} - 1)"
      val ia = s"GREATEST(0, ${intDiv(s"($latCol - (${r.latFrom}) + ${r.latStep - 1})", r.latStep.toString)} - 1)"
      sb.append(s" WHEN $cond THEN $offset + ($il) * ${r.nLat} + ($ia)")
      offset += r.cellCount
    }
    // whole-world catch-all; anything else (sentinels) overflows to size
    sb.append(s" WHEN ($lonCol >= ${Geo.MinLon} AND $lonCol <= ${Geo.MaxLon} AND $latCol >= ${Geo.MinLat} AND $latCol <= ${Geo.MaxLat}) THEN $offset")
    sb.append(s" ELSE ${offset + 1} END")
    sb.toString
  }

  def duckdbDiv(a: String, b: String): String = s"($a // $b)"
  def sparkDiv(a: String, b: String): String = s"($a DIV $b)"

  /** SQL closed forms of a tile id's bbox fields (whole-world input only):
    * the inverse of [[firstMatchPointSql]]. Returns (minlon, minlat,
    * maxlon, maxlat) expression texts over `tileCol`.
    */
  def tileBoundsSql(rows: Vector[BbsRow], tileCol: String,
                    intDiv: (String, String) => String): Seq[(String, String)] = {
    def gen(f: (BbsRow, String, String) => String): String = {
      val sb = new StringBuilder("CASE")
      var offset = 0L
      for (r <- rows) {
        val local = s"($tileCol - $offset)"
        val il = intDiv(local, r.nLat.toString)
        val ia = s"($local % ${r.nLat})"
        sb.append(s" WHEN $tileCol >= $offset AND $tileCol < ${offset + r.cellCount} THEN ${f(r, il, ia)}")
        offset += r.cellCount
      }
      sb.append(s" ELSE NULL END") // whole-world/overflow handled by caller
      sb.toString
    }
    Seq(
      "minlon" -> gen((r, il, _) => s"${r.lonFrom} + ($il) * ${r.lonStep}"),
      "minlat" -> gen((r, _, ia) => s"${r.latFrom} + ($ia) * ${r.latStep}"),
      "maxlon" -> gen((r, il, _) => s"${r.lonFrom} + (($il) + 1) * ${r.lonStep}"),
      "maxlat" -> gen((r, _, ia) => s"${r.latFrom} + (($ia) + 1) * ${r.latStep}"))
  }
}

/** Cell-indexed first-match lookup: a uniform index grid over the world
  * where each index cell holds the ascending list of tile-bbox ids
  * intersecting it. Point/rect lookup scans only those candidates, in
  * order, preserving exact first-match semantics while turning the O(|bounds|)
  * reference scan (ChunkGenerator.java:549-556) into O(candidates-per-cell).
  * Built once on the driver and broadcast; lookup is allocation-free.
  */
final class TileIndex(val bounds: Array[Bbox], gx: Int = 1024, gy: Int = 512)
    extends Serializable {
  private val spanLon = Geo.MaxLon.toLong - Geo.MinLon
  private val spanLat = Geo.MaxLat.toLong - Geo.MinLat
  // identity for the per-JVM candidate-list cache: every deserialized copy
  // of this index (one per task) shares one build per executor JVM
  private val cacheKey: String = java.util.UUID.randomUUID().toString

  private def ix(lon: Int): Int = {
    val i = ((lon.toLong - Geo.MinLon) * gx / spanLon).toInt
    if (i < 0) 0 else if (i >= gx) gx - 1 else i
  }
  private def iy(lat: Int): Int = {
    val i = ((lat.toLong - Geo.MinLat) * gy / spanLat).toInt
    if (i < 0) 0 else if (i >= gy) gy - 1 else i
  }

  // candidates(cy * gx + cx) = ascending tile ids intersecting that index cell.
  // @transient lazy + per-JVM cache: only the bounds array (~680 KB) rides the
  // task binary; the ~13 MB candidate lists are built ONCE per executor JVM
  // (not per deserialized task copy) and shared via the companion cache.
  @transient private lazy val candidates: Array[Array[Int]] =
    TileIndex.cache.computeIfAbsent(cacheKey, _ => build())

  private def build(): Array[Array[Int]] = {
    val buf = Array.fill(gx * gy)(new ArrayBuffer[Int](8))
    var b = 0
    while (b < bounds.length) {
      val bb = bounds(b)
      val x0 = ix(bb.minLon); val x1 = ix(bb.maxLon)
      val y0 = iy(bb.minLat); val y1 = iy(bb.maxLat)
      var cy = y0
      while (cy <= y1) {
        var cx = x0
        while (cx <= x1) {
          buf(cy * gx + cx) += b
          cx += 1
        }
        cy += 1
      }
      b += 1
    }
    buf.map(_.toArray) // ascending by construction
  }

  def tileOfPoint(lon: Int, lat: Int): Int = {
    val cand = candidates(iy(lat) * gx + ix(lon))
    var i = 0
    while (i < cand.length) {
      if (bounds(cand(i)).contains(lon, lat)) return cand(i)
      i += 1
    }
    bounds.length
  }

  /** First tile containing the whole rect. Any such tile contains the rect's
    * min corner, so the min-corner cell's candidate list is sufficient.
    */
  def tileOfRect(rect: Bbox): Int = {
    val cand = candidates(iy(rect.minLat) * gx + ix(rect.minLon))
    var i = 0
    while (i < cand.length) {
      if (bounds(cand(i)).containsRect(rect)) return cand(i)
      i += 1
    }
    bounds.length
  }

  def size: Int = bounds.length
}

object TileIndex {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Int]]]()
}
