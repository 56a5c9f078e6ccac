package graft.operators

import graft.core.Geo

/** From-scratch spatial cell encoders (no external geo jars exist in this
  * environment, so these are original implementations of the two standard
  * shapes):
  *
  *  - [[HexCells]]: an H3-style pointy-top hexagonal lattice over the
  *    fixed-point plane, aperture-sqrt7 per resolution step (area shrinks
  *    ~7x per res, like H3), axial coordinates with cube rounding, and
  *    k-ring neighborhood walks — the substrate for ring-expansion kNN.
  *  - [[HilbertCells]]: an S2-style space-filling-curve cell id — cube-face
  *    projection of the unit sphere, then a Hilbert curve per face, so
  *    nearby cells get nearby ids (the locality property S2 is used for).
  */
object HexCells {

  /** circumradius (fixed-point units) at a resolution: res 0 ~ 40 deg,
    * shrinking by sqrt(7) per level (aperture-7 hierarchy like H3). */
  def radius(res: Int): Double = 4e8 / math.pow(math.sqrt(7.0), res)

  private val Sqrt3 = math.sqrt(3.0)

  /** axial (q, r) of the hex containing the point, via cube rounding. */
  def cell(lon: Int, lat: Int, res: Int): (Int, Int) = {
    val s = radius(res)
    val qf = (Sqrt3 / 3.0 * lon - 1.0 / 3.0 * lat) / s
    val rf = (2.0 / 3.0 * lat) / s
    cubeRound(qf, rf)
  }

  def cubeRound(qf: Double, rf: Double): (Int, Int) = {
    val sf = -qf - rf
    var q = math.round(qf).toInt
    var r = math.round(rf).toInt
    val sC = math.round(sf).toInt
    val dq = math.abs(q - qf); val dr = math.abs(r - rf); val ds = math.abs(sC - sf)
    if (dq > dr && dq > ds) q = -r - sC
    else if (dr > ds) r = -q - sC
    (q, r)
  }

  def center(q: Int, r: Int, res: Int): (Double, Double) = {
    val s = radius(res)
    (s * (Sqrt3 * q + Sqrt3 / 2.0 * r), s * (1.5 * r))
  }

  /** pack (res, q, r) into one long cell id. */
  def pack(res: Int, q: Int, r: Int): Long =
    (res.toLong << 56) | ((q.toLong & 0xfffffffL) << 28) | (r.toLong & 0xfffffffL)
  def unpack(id: Long): (Int, Int, Int) = {
    val res = (id >> 56).toInt
    val q = ((id >> 28) & 0xfffffffL).toInt << 4 >> 4 // sign-extend 28 bits
    val r = (id & 0xfffffffL).toInt << 4 >> 4
    (res, q, r)
  }

  def encode(lon: Int, lat: Int, res: Int): Long = {
    val (q, r) = cell(lon, lat, res)
    pack(res, q, r)
  }

  private val Dirs = Array((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

  /** the standard k-ring walk: cells at exactly hex-distance k. */
  def ring(q: Int, r: Int, k: Int): Seq[(Int, Int)] = {
    if (k == 0) return Seq((q, r))
    val out = Seq.newBuilder[(Int, Int)]
    var cq = q + Dirs(4)._1 * k
    var cr = r + Dirs(4)._2 * k
    for (i <- 0 until 6; _ <- 0 until k) {
      out += ((cq, cr))
      cq += Dirs(i)._1; cr += Dirs(i)._2
    }
    out.result()
  }

  def hexDistance(q1: Int, r1: Int, q2: Int, r2: Int): Int =
    (math.abs(q1 - q2) + math.abs(r1 - r2) + math.abs((q1 + r1) - (q2 + r2))) / 2

  /** packed ids of every cell at hex distance <= maxD from the point's own
    * cell — the kNN probe neighbourhood as one flat primitive array
    * (1 + 3*maxD*(maxD+1) entries), callable from generated code
    * (graft.plans.HexProbes). */
  def probes(lon: Int, lat: Int, res: Int, maxD: Int): Array[Long] = {
    val (q, r) = cell(lon, lat, res)
    val out = new Array[Long](1 + 3 * maxD * (maxD + 1))
    var i = 0
    var d = 0
    while (d <= maxD) {
      ring(q, r, d).foreach { case (a, b) => out(i) = pack(res, a, b); i += 1 }
      d += 1
    }
    out
  }

  /** EXACT min Euclidean distance from the center of a cell to any point of
    * any cell at hex distance exactly h (in `radius(res)` units x that
    * radius): the naive "big hexagon inradius" over-estimates because the
    * ring boundary has re-entrant valley vertices (true values 0.866, 2.0,
    * 3.606, 5.0, ... x r0 for h = 1..4 — vs sqrt(3)/2*(2h-1) = 0.87, 2.6,
    * 4.3, 6.1). Monotone in h, so it lower-bounds every cell at >= h.
    * Used by the kNN ring-expansion certification (KnnHex).
    */
  def minRingDist(res: Int, h: Int): Double = {
    val r0 = radius(res)
    def segDist(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
      val dx = bx - ax; val dy = by - ay
      val t0 = ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)
      val t = math.max(0.0, math.min(1.0, t0))
      math.hypot(px - (ax + t * dx), py - (ay + t * dy))
    }
    var best = Double.PositiveInfinity
    for ((q, r) <- ring(0, 0, h)) {
      val (cx, cy) = center(q, r, res)
      // pointy-top vertices at angles 30 + 60k degrees, circumradius r0
      val v = Array.tabulate(6) { k =>
        val a = math.toRadians(30 + 60 * k)
        (cx + r0 * math.cos(a), cy + r0 * math.sin(a))
      }
      var i = 0
      while (i < 6) {
        val (ax, ay) = v(i); val (bx, by) = v((i + 1) % 6)
        best = math.min(best, segDist(0, 0, ax, ay, bx, by))
        i += 1
      }
    }
    best
  }
}

object HilbertCells {

  /** face (0..5) and [0,1]^2 face coordinates via cube projection. */
  def faceUV(lon: Int, lat: Int): (Int, Double, Double) = {
    val lonR = lon * 1e-7 * math.Pi / 180.0
    val latR = lat * 1e-7 * math.Pi / 180.0
    val x = math.cos(latR) * math.cos(lonR)
    val y = math.cos(latR) * math.sin(lonR)
    val z = math.sin(latR)
    val (ax, ay, az) = (math.abs(x), math.abs(y), math.abs(z))
    // face: the dominant axis, sign picks the hemisphere
    if (ax >= ay && ax >= az) {
      if (x > 0) (0, y / x, z / x) else (3, z / x, y / x)
    } else if (ay >= az) {
      if (y > 0) (1, z / y, x / y) else (4, x / y, z / y)
    } else {
      if (z > 0) (2, x / z, y / z) else (5, y / z, x / z)
    }
  }

  /** xy -> Hilbert distance on a 2^order grid (iterative, public-domain
    * rot/swap formulation). */
  def hilbertD(order: Int, x0: Int, y0: Int): Long = {
    var rx = 0; var ry = 0
    var d = 0L
    var x = x0; var y = y0
    var s = 1 << (order - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** S2-style cell id: 3 bits face, then the Hilbert index at `res`
    * (2 bits per level), res in the low 5 bits.
    */
  def encode(lon: Int, lat: Int, res: Int): Long = {
    val (face, u, v) = faceUV(lon, lat)
    val n = 1 << res
    def q(t: Double): Int = {
      val i = ((t + 1.0) / 2.0 * n).toInt
      if (i < 0) 0 else if (i >= n) n - 1 else i
    }
    val d = hilbertD(res, q(u), q(v))
    (face.toLong << 58) | (d << 5) | res.toLong
  }
}

/** Z-order (Morton) cells over the planar fixed-point domain: a 2^res x
  * 2^res grid, cell id = bit-interleave of (cx, cy). Unlike the hex/Hilbert
  * encoders this index exists for DATA LAYOUT: a table written sorted by
  * the morton key keeps spatially-near rows in the same file / parquet row
  * group, so a bbox query becomes a short list of contiguous key ranges
  * whose column min/max statistics skip everything else — the standard
  * z-order file-skipping design for a 100 TB geo table.
  */
object ZCells {
  import graft.core.Geo
  private val spanLon = Geo.MaxLon.toLong - Geo.MinLon
  private val spanLat = Geo.MaxLat.toLong - Geo.MinLat

  def cellX(lon: Int, res: Int): Int = {
    val n = 1 << res
    val i = ((lon.toLong - Geo.MinLon) * n / spanLon).toInt
    if (i < 0) 0 else if (i >= n) n - 1 else i
  }
  def cellY(lat: Int, res: Int): Int = {
    val n = 1 << res
    val i = ((lat.toLong - Geo.MinLat) * n / spanLat).toInt
    if (i < 0) 0 else if (i >= n) n - 1 else i
  }

  /** x in the even bits, y in the odd bits. */
  def interleave(x: Int, y: Int): Long = {
    var m = 0L
    var i = 0
    while (i < 31) {
      m |= ((x.toLong >> i) & 1L) << (2 * i)
      m |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    m
  }

  def encode(lon: Int, lat: Int, res: Int): Long =
    interleave(cellX(lon, res), cellY(lat, res))

  /** Covering morton-id ranges of a planar bbox at `res`: quadtree descent
    * emitting one contiguous range per fully-contained quadrant (a quadrant
    * is a fixed bit prefix, so its subtree is the contiguous id interval
    * [base, base + 4^depth - 1]) and recursing on partial overlap. Covers
    * every cell INTERSECTING the bbox — candidates, with the exact bbox
    * filter run after the range scan. `maxRanges` coarsens by merging the
    * closest-gap neighbours (only ever ADDS cells, so completeness is
    * preserved), bounding the predicate size a scan must evaluate.
    */
  def cover(minLon: Int, minLat: Int, maxLon: Int, maxLat: Int, res: Int,
      maxRanges: Int = 64): Array[(Long, Long)] = {
    require(res >= 1 && res <= 30 && maxRanges >= 1)
    val x0 = cellX(minLon, res); val x1 = cellX(maxLon, res)
    val y0 = cellY(minLat, res); val y1 = cellY(maxLat, res)
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def rec(level: Int, qx: Int, qy: Int): Unit = {
      val shift = res - level
      val loX = qx << shift; val hiX = loX + (1 << shift) - 1
      val loY = qy << shift; val hiY = loY + (1 << shift) - 1
      if (hiX < x0 || loX > x1 || hiY < y0 || loY > y1) return // disjoint
      if (loX >= x0 && hiX <= x1 && loY >= y0 && hiY <= y1) {
        val base = interleave(loX, loY)
        buf += ((base, base + (1L << (2 * shift)) - 1))
        return
      }
      if (level == res) return // unreachable: a single cell is inside or disjoint
      rec(level + 1, qx * 2, qy * 2); rec(level + 1, qx * 2 + 1, qy * 2)
      rec(level + 1, qx * 2, qy * 2 + 1); rec(level + 1, qx * 2 + 1, qy * 2 + 1)
    }
    rec(0, 0, 0)
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (r <- buf.sortBy(_._1))
      if (merged.nonEmpty && merged.last._2 + 1 >= r._1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    while (merged.length > maxRanges) {
      var best = 1; var bestGap = Long.MaxValue
      for (i <- 1 until merged.length) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
      }
      merged(best - 1) = (merged(best - 1)._1, merged(best)._2)
      merged.remove(best)
    }
    merged.toArray
  }
}
