package graft.core

/** Fixed-point geodesic primitives.
  *
  * Coordinate space: int32 degrees x 1e7, world =
  * [-1_800_000_000, 1_800_000_000] x [-900_000_000, 900_000_000]
  * (reference: Bounds.java:33-36). All predicates replicate the reference
  * semantics bit-for-bit, including its arithmetic quirks, because the
  * engine's tile assignments are golden-diffed against it.
  */
object Geo {
  val MinLon: Int = -1800000000
  val MaxLon: Int = 1800000000
  val MinLat: Int = -900000000
  val MaxLat: Int = 900000000

  /** Missing-geometry sentinel (reference: ChunkGenerator.java:326-327). */
  val Sentinel: Int = Int.MaxValue

  /** Reference coordinate rounding: `(int)(0.5 + 1e7 * deg)`
    * (OSMXMLReader.java:75-77). Note the asymmetric treatment of negative
    * values: the Java (int) cast truncates toward zero AFTER the +0.5, so
    * -1.00000005 deg -> (int)(0.5 - 10000000.5) = -10000000.
    */
  def fixedPoint(deg: Double): Int = (0.5 + 1e7 * deg).toInt

  /** Point-in-polygon, odd-even ray casting with the reference's half-open
    * crossing rule and integer/long slope arithmetic (Point.java:19-36).
    * The polygon is given as parallel coordinate arrays; the last vertex is
    * NOT implicitly connected to the first — callers pass rings whose
    * closing segment is explicit (reference iterates i in [0, n-2]).
    */
  def pointInPolygon(lon: Int, lat: Int, plon: Array[Int], plat: Array[Int]): Boolean = {
    var inside = false
    var i = 0
    while (i < plon.length - 1) {
      val x1 = plon(i).toLong
      val y1 = plat(i).toLong
      val x2 = plon(i + 1).toLong
      val y2 = plat(i + 1).toLong
      // crossing iff (y1<=lat) == (lat<y2): the reference skips on `!=`
      if (y1 != y2 && ((y1 <= lat) == (lat < y2))) {
        // long arithmetic, Java truncating division — do not "fix" rounding
        if (x1 + (x2 - x1) * (lat - y1) / (y2 - y1) < lon)
          inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Shoelace orientation (Area.java:128-135). `sum >= 0` means clockwise.
    * QUIRK (replicated deliberately): each edge product is computed in Int
    * and may overflow before being widened to Long for the sum — the
    * reference does `(lon[j]-lon[i])*(lat[j]+lat[i])` in int. World-scale
    * rings therefore mis-orient exactly as the reference does.
    */
  def isClockwise(lon: Array[Int], lat: Array[Int]): Boolean = {
    var sum = 0L
    val n = lon.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      sum += ((lon(j) - lon(i)) * (lat(j) + lat(i))).toLong
      i += 1
    }
    sum >= 0
  }

  def reverseInPlace(a: Array[Int]): Unit = {
    var i = 0
    val n = a.length
    while (i < n / 2) {
      val t = a(i); a(i) = a(n - i - 1); a(n - i - 1) = t
      i += 1
    }
  }

  /** Ring normalization (Area.java:112-126): outer ring forced clockwise,
    * holes forced counter-clockwise, reversing in place.
    */
  def normalizeRings(lon: Array[Int], lat: Array[Int],
                     hlon: Array[Array[Int]], hlat: Array[Array[Int]]): Unit = {
    if (!isClockwise(lon, lat)) { reverseInPlace(lon); reverseInPlace(lat) }
    var i = 0
    while (i < hlon.length) {
      if (isClockwise(hlon(i), hlat(i))) { reverseInPlace(hlon(i)); reverseInPlace(hlat(i)) }
      i += 1
    }
  }

  /** `>= 3 points and first == last` (Way.java:53-56). */
  def isClosed(lon: Array[Int], lat: Array[Int]): Boolean =
    lon.length >= 3 && lon(0) == lon(lon.length - 1) && lat(0) == lat(lat.length - 1)
}

/** Closed bounding box in fixed-point space (Bounds.java:58-85): contains is
  * closed on all four edges; an element is contained iff ALL its vertices
  * (including hole vertices) are.
  */
final case class Bbox(minLon: Int, minLat: Int, maxLon: Int, maxLat: Int) {
  def contains(lon: Int, lat: Int): Boolean =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat

  def contains(lon: Array[Int], lat: Array[Int]): Boolean = {
    var i = 0
    while (i < lon.length) {
      if (!contains(lon(i), lat(i))) return false
      i += 1
    }
    true
  }

  def contains(lon: Array[Int], lat: Array[Int],
               hlon: Array[Array[Int]], hlat: Array[Array[Int]]): Boolean = {
    if (!contains(lon, lat)) return false
    var i = 0
    while (i < hlon.length) {
      var j = 0
      while (j < hlon(i).length) {
        if (!contains(hlon(i)(j), hlat(i)(j))) return false
        j += 1
      }
      i += 1
    }
    true
  }

  /** Containment of a whole rectangle (all-vertex containment of any element
    * is equivalent to containment of the element's bbox).
    */
  def containsRect(o: Bbox): Boolean =
    o.minLon >= minLon && o.maxLon <= maxLon && o.minLat >= minLat && o.maxLat <= maxLat

  def intersects(b: Bbox): Boolean =
    b.maxLon >= minLon && b.minLon <= maxLon && b.maxLat >= minLat && b.minLat <= maxLat
}

object Bbox {
  val WholeWorld: Bbox = Bbox(Geo.MinLon, Geo.MinLat, Geo.MaxLon, Geo.MaxLat)
  /** "No bounds" marker chunk bounds (Bounds.java:38-41). */
  val NoBounds: Bbox = Bbox(Int.MaxValue, Int.MaxValue, Int.MaxValue, Int.MaxValue)
}
