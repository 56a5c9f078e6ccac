package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreKernelsSpec extends AnyFunSuite {
  // deterministic sampling in place of scalacheck's forAll (the
  // scalatest/scalacheck bridge isn't in the offline cache)
  private val rnd = new java.util.Random(42)
  private def sample(n: Int)(f: => Unit): Unit = (0 until n).foreach(_ => f)
  private def rint(lo: Int, hi: Int): Int =
    (lo + ((rnd.nextLong() >>> 1) % (hi.toLong - lo + 1))).toInt

  test("fixedPoint replicates the reference's asymmetric rounding") {
    assert(Geo.fixedPoint(1.00000005) == 10000001)
    // negative values: (int)(0.5 + x) truncates toward zero
    assert(Geo.fixedPoint(-1.00000005) == -10000000)
    assert(Geo.fixedPoint(0.0) == 0)
    assert(Geo.fixedPoint(-0.00000004) == 0)
  }

  test("pointInPolygon: unit square semantics (half-open crossing rule)") {
    // closed ring, explicit closing segment (reference iterates n-1 edges)
    val lon = Array(0, 10, 10, 0, 0)
    val lat = Array(0, 0, 10, 10, 0)
    assert(Geo.pointInPolygon(5, 5, lon, lat))
    assert(!Geo.pointInPolygon(15, 5, lon, lat))
    assert(!Geo.pointInPolygon(-5, 5, lon, lat))
    // the kernel ray-casts to the LEFT (counts crossings with x < lon), so
    // boundary behavior is: bottom & right edges inside, top & left outside
    assert(Geo.pointInPolygon(5, 0, lon, lat))   // bottom edge midpoint: inside
    assert(!Geo.pointInPolygon(5, 10, lon, lat)) // top edge midpoint: outside
    assert(!Geo.pointInPolygon(0, 5, lon, lat))  // left edge: outside
    assert(Geo.pointInPolygon(10, 5, lon, lat))  // right edge: inside
  }

  test("isClockwise including the deliberate int-overflow quirk") {
    // CCW triangle (positive area in standard orientation) => sum < 0 => false
    assert(!Geo.isClockwise(Array(0, 10, 0), Array(0, 0, 10)))
    assert(Geo.isClockwise(Array(0, 0, 10), Array(0, 10, 0)))
    // world-scale ring where (x2-x1)*(y2+y1) overflows Int: replicate overflow
    val lonBig = Array(-1800000000, 1800000000, 0)
    val latBig = Array(800000000, 800000000, -800000000)
    val refSum = { // reference arithmetic: int product widened after overflow
      var s = 0L
      val n = 3
      for (i <- 0 until n) {
        val j = (i + 1) % n
        s += ((lonBig(j) - lonBig(i)) * (latBig(j) + latBig(i))).toLong
      }
      s
    }
    assert(Geo.isClockwise(lonBig, latBig) == (refSum >= 0))
  }

  test("bbs default grid expands to the expected cell count, whole world last") {
    val rows = Bbs.parse(Bbs.DefaultBbs)
    val bounds = Bbs.expand(rows)
    val expected = rows.map(_.cellCount).sum + 1
    assert(bounds.length == expected)
    assert(bounds.last == Bbox.WholeWorld)
    assert(bounds.length == 42339)
  }

  test("TileIndex point lookup == linear first-match scan (property)") {
    val bounds = Bbs.expand(Bbs.parse(Bbs.DefaultBbs))
    val index = new TileIndex(bounds)
    sample(500) {
      val lon = rint(Geo.MinLon, Geo.MaxLon)
      val lat = rint(Geo.MinLat, Geo.MaxLat)
      assert(index.tileOfPoint(lon, lat) == Bbs.firstMatch(bounds, lon, lat))
    }
    // grid-line edge cases: closed bounds, first match wins
    for (lon <- Seq(Geo.MinLon, -10000000, 0, 10000000, Geo.MaxLon);
         lat <- Seq(Geo.MinLat, -450000000, 0, 450000000, 850000000, Geo.MaxLat))
      assert(index.tileOfPoint(lon, lat) == Bbs.firstMatch(bounds, lon, lat))
    // sentinel coords overflow to bounds.length
    assert(index.tileOfPoint(Int.MaxValue, Int.MaxValue) == bounds.length)
  }

  test("TileIndex rect lookup == linear rect scan (property)") {
    val bounds = Bbs.expand(Bbs.parse(Bbs.DefaultBbs))
    val index = new TileIndex(bounds)
    sample(500) {
      val lon = rint(Geo.MinLon, Geo.MaxLon - 1000)
      val lat = rint(Geo.MinLat, Geo.MaxLat - 1000)
      val r = Bbox(lon, lat,
        math.min(Geo.MaxLon, lon + rnd.nextInt(50000000)),
        math.min(Geo.MaxLat, lat + rnd.nextInt(50000000)))
      assert(index.tileOfRect(r) == Bbs.firstMatchRect(bounds, r))
    }
  }

  test("h60 matches its own SQL contract shape") {
    val v = PortableHash.h60("hello")
    assert(v >= 0 && v < (1L << 60))
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 -> 5d41402abc4b2a7
    assert(v == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("prepared polygons contain their centers' vicinity consistently") {
    val set = graft.operators.Pip.fixtureSet
    val polys = graft.operators.Pip.fixturePolygons
    for (p <- polys) {
      val cx = (p.bbox.minLon.toLong + p.bbox.maxLon) / 2
      val cy = (p.bbox.minLat.toLong + p.bbox.maxLat) / 2
      val m = set.mask(cx.toInt, cy.toInt)
      assert(((m >> p.id) & 1L) == (if (p.contains(cx.toInt, cy.toInt)) 1L else 0L))
    }
  }
}
