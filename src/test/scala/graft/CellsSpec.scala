package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{HexCells, HilbertCells}

class CellsSpec extends AnyFunSuite {
  private val rnd = new java.util.Random(7)
  private def rint(lo: Int, hi: Int): Int =
    (lo + ((rnd.nextLong() >>> 1) % (hi.toLong - lo + 1))).toInt

  test("hex: pack/unpack round-trips signed axial coords") {
    for (_ <- 0 until 200) {
      val res = rnd.nextInt(10)
      val q = rint(-10000000, 10000000)
      val r = rint(-10000000, 10000000)
      assert(HexCells.unpack(HexCells.pack(res, q, r)) == ((res, q, r)))
    }
  }

  test("hex: a point's cell center is within the circumradius") {
    for (res <- 0 to 5; _ <- 0 until 100) {
      val lon = rint(-1500000000, 1500000000)
      val lat = rint(-800000000, 800000000)
      val (q, r) = HexCells.cell(lon, lat, res)
      val (cx, cy) = HexCells.center(q, r, res)
      val d = math.hypot(lon - cx, lat - cy)
      assert(d <= HexCells.radius(res) * 1.0001, s"res=$res d=$d R=${HexCells.radius(res)}")
    }
  }

  test("hex: ring(k) has 6k distinct cells, all at hex distance k") {
    for (k <- 1 to 5) {
      val cells = HexCells.ring(3, -2, k)
      assert(cells.length == 6 * k)
      assert(cells.distinct.length == cells.length)
      assert(cells.forall { case (q, r) => HexCells.hexDistance(3, -2, q, r) == k })
    }
    assert(HexCells.ring(3, -2, 0) == Seq((3, -2)))
  }

  test("hex: cell assignment is the nearest center (cube-round property)") {
    for (_ <- 0 until 300) {
      val res = 3
      val lon = rint(-1000000000, 1000000000)
      val lat = rint(-800000000, 800000000)
      val (q, r) = HexCells.cell(lon, lat, res)
      val (cx, cy) = HexCells.center(q, r, res)
      val dOwn = math.hypot(lon - cx, lat - cy)
      // no neighbor center is meaningfully closer
      for ((nq, nr) <- HexCells.ring(q, r, 1)) {
        val (nx, ny) = HexCells.center(nq, nr, res)
        assert(dOwn <= math.hypot(lon - nx, lat - ny) + 1e-6)
      }
    }
  }

  test("hilbert: distances are a bijection on the grid") {
    val order = 5
    val n = 1 << order
    val ds = for (x <- 0 until n; y <- 0 until n) yield HilbertCells.hilbertD(order, x, y)
    assert(ds.distinct.length == n * n)
    assert(ds.min == 0L && ds.max == n.toLong * n - 1)
  }

  test("hilbert: adjacent curve positions are adjacent grid cells (locality)") {
    val order = 5
    val n = 1 << order
    val pos = Array.ofDim[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) pos(HilbertCells.hilbertD(order, x, y).toInt) = (x, y)
    for (i <- 1 until n * n) {
      val (x1, y1) = pos(i - 1); val (x2, y2) = pos(i)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at $i")
    }
  }

  test("hilbert cell ids: same point same id; distinct faces") {
    val a = HilbertCells.encode(100000000, 200000000, 10)
    assert(a == HilbertCells.encode(100000000, 200000000, 10))
    val faces = Seq(
      (0, 0), (900000000, 0), (1795000000, 0), (-900000000, 0),
      (0, 890000000), (0, -890000000)).map { case (lo, la) =>
      HilbertCells.faceUV(lo, la)._1
    }
    assert(faces.distinct.length == 6)
  }
}
