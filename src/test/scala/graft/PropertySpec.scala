package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.{Bbox, Geo}
import graft.oma._

/** Property-based layer (SURVEY §5.3), pure scalacheck (no scalatestplus
  * bridge in the offline cache): randomized inputs against the pure
  * kernels — codec round trips over arbitrary values, tile assignment
  * equal to the naive first-match scan, ring assembly from shuffled /
  * reversed segment soups, and o5m/pbf container round trips over
  * arbitrary element sets (including the reset-segmented o5m variant).
  * Assertion failures inside a body fail the property; scalacheck reports
  * the shrunk counterexample through the result.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 60): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString.take(800))
  }

  // ---- varints -----------------------------------------------------------

  test("varint u/s round-trips arbitrary longs") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      val o = new Varint.Out; o.s(v)
      new Varint.In(o.result()).s() == v
    })
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val o = new Varint.Out; o.u(v)
      new Varint.In(o.result()).u() == v
    })
  }

  // ---- OMA scalar codecs -------------------------------------------------

  test("smallInt and string round-trip arbitrary values") {
    check(Prop.forAll(Gen.chooseNum(0, Int.MaxValue)) { v =>
      val b = new OmaBuf; b.writeSmallInt(v)
      new OmaReader.In(b.toBytes).readSmallInt() == v
    })
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val b = new OmaBuf; b.writeString(s)
      new OmaReader.In(b.toBytes).readString() == s
    })
  }

  test("delta coordinate codec round-trips arbitrary int sequences") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue))) { xs =>
      val b = new OmaBuf
      val st = new DeltaState
      xs.foreach(st.writeX(b, _))
      val in = new OmaReader.In(b.toBytes)
      xs.map(_ => in.readDeltaX()) == xs
    })
  }

  // ---- tile assignment ---------------------------------------------------

  private val genBbox: Gen[Bbox] = for {
    lon0 <- Gen.chooseNum(Geo.MinLon, Geo.MaxLon - 1)
    lat0 <- Gen.chooseNum(Geo.MinLat, Geo.MaxLat - 1)
    dl <- Gen.chooseNum(1, 400000000)
    dt <- Gen.chooseNum(1, 200000000)
  } yield Bbox(lon0, lat0, math.min(Geo.MaxLon, lon0.toLong + dl).toInt,
    math.min(Geo.MaxLat, lat0.toLong + dt).toInt)

  test("TileIndex.tileOfPoint equals the naive first-match scan; total") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(genBbox),
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(Geo.MinLon, Geo.MaxLon),
                              Gen.chooseNum(Geo.MinLat, Geo.MaxLat)))) { (bs, pts) =>
      val bounds = bs.toArray
      val idx = new core.TileIndex(bounds)
      pts.forall { case (lon, lat) =>
        val naive = bounds.indexWhere(_.contains(lon, lat)) match {
          case -1 => bounds.length
          case i => i
        }
        val got = idx.tileOfPoint(lon, lat)
        got == naive && got >= 0 && got <= bounds.length
      }
    }, n = 40)
  }

  // ---- ring assembly -----------------------------------------------------

  /** A random closed cycle split into consecutive segments, some reversed,
    * in shuffled order; returns (segment soup, cycle vertices). */
  private val genRingSoup: Gen[(IndexedSeq[Assembly.Ring], IndexedSeq[(Int, Int)])] = for {
    k <- Gen.chooseNum(4, 12)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val pts = (0 until k).map { i =>
      val a = 2 * math.Pi * i / k
      ((1000000 * math.cos(a)).toInt + 2000000 * (seed % 3),
        (1000000 * math.sin(a)).toInt)
    }
    val cycle = pts :+ pts.head
    val nCuts = 1 + rnd.nextInt(math.max(1, k - 1))
    val cutAt = (0 +: rnd.shuffle((1 until k).toList).take(nCuts - 1).sorted) :+ k
    val segs = cutAt.sliding(2).map { case Seq(a, b) =>
      val part = cycle.slice(a, b + 1)
      val p = if (rnd.nextBoolean()) part.reverse else part
      (p.map(_._1).toArray, p.map(_._2).toArray): Assembly.Ring
    }.toIndexedSeq
    (rnd.shuffle(segs), pts)
  }

  test("ring assembly closes shuffled/reversed segment soups; vertex set preserved") {
    check(Prop.forAll(genRingSoup) { case (segs, pts) =>
      val rings = Assembly.createRings(segs)
      assert(rings.isDefined, s"assembly failed for ${segs.length} segments")
      val all = rings.get
      assert(all.size == 1, s"expected one ring, got ${all.size}")
      val r = all.head
      assert(r._1.head == r._1.last && r._2.head == r._2.last, "ring not closed")
      assert(r._1.zip(r._2).toSet == pts.toSet, "vertex set changed")
      true
    })
  }

  test("normalizeRings forces outer CW and holes CCW on assembled rings") {
    check(Prop.forAll(genRingSoup) { case (segs, _) =>
      Assembly.createRings(segs).toSeq.flatten.forall { r =>
        val lon = r._1.clone(); val lat = r._2.clone()
        val h1 = r._1.map(_ + 1000); val h2 = r._2.clone()
        Geo.normalizeRings(lon, lat, Array(h1), Array(h2))
        Geo.isClockwise(lon, lat) && !Geo.isClockwise(h1, h2)
      }
    })
  }

  // ---- cell encoders -----------------------------------------------------

  test("hex cell pack/unpack round-trips; encode assigns the nearest center") {
    check(Prop.forAll(Gen.chooseNum(0, 12), Gen.chooseNum(-100000, 100000),
                      Gen.chooseNum(-100000, 100000)) { (res, q, r) =>
      operators.HexCells.unpack(operators.HexCells.pack(res, q, r)) == ((res, q, r))
    })
    check(Prop.forAll(Gen.chooseNum(3, 6),
                      Gen.chooseNum(-1500000000, 1500000000),
                      Gen.chooseNum(-800000000, 800000000)) { (res, lon, lat) =>
      val (_, q, r) = operators.HexCells.unpack(operators.HexCells.encode(lon, lat, res))
      val (cx, cy) = operators.HexCells.center(q, r, res)
      // the assigned cell's center is within the circumradius of the point
      // (cube rounding = nearest center in axial space)
      math.hypot(lon - cx, lat - cy) <= operators.HexCells.radius(res) * 1.0001
    })
  }

  test("hilbert d is a bijection onto [0, 4^order) for small orders") {
    for (order <- 2 to 6) {
      val side = 1 << order
      val ds = for (x <- 0 until side; y <- 0 until side)
        yield operators.HilbertCells.hilbertD(order, x, y)
      assert(ds.toSet == (0L until (1L << (2 * order))).toSet, s"order $order not bijective")
    }
  }

  // ---- point in polygon --------------------------------------------------

  /** Random convex polygon (closed, CCW by angular construction) and the
    * independent convexity oracle: strictly inside iff the point is on the
    * same (left) side of every directed edge. The ray-casting kernel and
    * the half-plane test share no code or approach. Points within 3 units
    * of any edge line are skipped (the kernel's half-open boundary rule is
    * its own contract, golden-tested; the property targets the interior).
    */
  test("pointInPolygon agrees with the half-plane oracle on convex polygons") {
    val genPoly: Gen[(Array[Int], Array[Int])] = for {
      k <- Gen.chooseNum(3, 9)
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      val radii = Seq.fill(k)(200000 + rnd.nextInt(800000))
      val pts = (0 until k).map { i =>
        val a = 2 * math.Pi * i / k + 0.1
        ((radii(i) * math.cos(a)).toInt, (radii(i) * math.sin(a)).toInt)
      }
      // angular order around the origin is not always convex for varying
      // radii — take the convex hull (gift wrap on few points)
      val hull = {
        val sorted = pts.sortBy(p => (p._1.toLong, p._2.toLong))
        def cross(o: (Int, Int), a: (Int, Int), b: (Int, Int)): Long =
          (a._1.toLong - o._1) * (b._2.toLong - o._2) - (a._2.toLong - o._2) * (b._1.toLong - o._1)
        def half(ps: Seq[(Int, Int)]): Seq[(Int, Int)] =
          ps.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
            var a = acc
            while (a.size >= 2 && cross(a(1), a.head, p) <= 0) a = a.tail
            p :: a
          }.reverse
        val lower = half(sorted).dropRight(1)
        val upper = half(sorted.reverse).dropRight(1)
        lower ++ upper
      }
      val closed = hull :+ hull.head
      (closed.map(_._1).toArray, closed.map(_._2).toArray)
    }
    check(Prop.forAll(genPoly,
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(-1200000, 1200000),
                              Gen.chooseNum(-1200000, 1200000)))) { case ((px, py), pts) =>
      if (px.length < 4) true // degenerate hull, skip
      else pts.forall { case (x, y) =>
        def edgeSide(i: Int): Long =
          (px(i + 1).toLong - px(i)) * (y.toLong - py(i)) -
            (py(i + 1).toLong - py(i)) * (x.toLong - px(i))
        val sides = (0 until px.length - 1).map(edgeSide)
        // skip points near any edge line (within ~3 units of colinear)
        val nearEdge = (0 until px.length - 1).exists { i =>
          val len = math.hypot(px(i + 1) - px(i), py(i + 1) - py(i))
          len > 0 && math.abs(sides(i)) / len < 3.0
        }
        if (nearEdge) true
        else {
          val inside = sides.forall(_ > 0) // CCW hull: left of every edge
          Geo.pointInPolygon(x, y, px, py) == inside
        }
      }
    })
  }

  // ---- container round trips --------------------------------------------

  private val genSafeStr: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val genMeta: Gen[Meta] = for {
    id <- Gen.chooseNum(1L, 1L << 40)
    v <- Gen.chooseNum(1, 100)
    ts <- Gen.chooseNum(1L, 2000000000L)
    cs <- Gen.chooseNum(0L, 1L << 30)
    uid <- Gen.chooseNum(0, 100000)
    user <- genSafeStr
  } yield Meta(id, v, ts, cs, uid, user)

  // long values exercise the > 250-byte string-pair-table eviction rule
  private val genTags: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(genSafeStr.map("k" + _),
      Gen.oneOf(genSafeStr, Gen.stringOfN(260, Gen.alphaNumChar))))

  private val genInput: Gen[OsmInput] = for {
    nodes <- Gen.listOf(for {
      m <- genMeta; lon <- Gen.chooseNum(Geo.MinLon, Geo.MaxLon)
      lat <- Gen.chooseNum(Geo.MinLat, Geo.MaxLat); t <- genTags
    } yield OsmNode(m, lon, lat, t))
    ways <- Gen.listOf(for {
      m <- genMeta; nds <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1L << 40)); t <- genTags
    } yield OsmWay(m, nds, t))
    rels <- Gen.listOf(for {
      m <- genMeta
      ms <- Gen.listOf(for {
        mt <- Gen.oneOf("node", "way", "relation")
        ref <- Gen.chooseNum(1L, 1L << 40)
        role <- genSafeStr
      } yield OsmMember(mt, ref, role))
      t <- genTags
    } yield OsmRelation(m, ms, t))
  } yield OsmInput(None, nodes, ways, rels)

  test("o5m round-trips arbitrary element sets (plain and reset-segmented)") {
    check(Prop.forAll(genInput, Gen.chooseNum(1, 7)) { (in, every) =>
      assert(O5m.decode(O5m.write(in)) == in)
      val resetful = O5m.write(in, resetEvery = every)
      assert(O5m.decode(resetful) == in)
      val merged = O5m.merge(O5m.segments(resetful).map { case (a, b) =>
        O5m.decode(java.util.Arrays.copyOfRange(resetful, a, b))
      })
      assert(merged == in)
      true
    }, n = 30)
  }

  test("pbf round-trips arbitrary element sets across block sizes") {
    check(Prop.forAll(genInput, Gen.oneOf(1, 3, 1000)) { (in, perBlock) =>
      Pbf.decode(Pbf.write(in, perBlock = perBlock)) == in
    }, n = 30)
  }

  // ---- media codecs ------------------------------------------------------

  test("image and audio codecs round-trip arbitrary ids and sizes") {
    // lossless round trip at ANY size; the >= 40 dB quality bound is a
    // statistical property of the quantizer and only claimed at the sizes
    // the engine's tables actually produce (w,h >= 16 / n >= 1024) — on a
    // 1x1 image (3 samples) a worst-case draw legitimately dips below it
    check(Prop.forAll(genSafeStr, Gen.chooseNum(1, 24), Gen.chooseNum(1, 24)) { (id0, w, h) =>
      val id = "p" + id0
      val (dw, dh, px) = sources.ImageCodec.decode(sources.ImageCodec.encode("raw", id, w, h))
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(px, sources.ImageCodec.pixels(id, w, h)))
      val (qw, qh, qpx) = sources.ImageCodec.decode(sources.ImageCodec.encode("qrle", id, w, h))
      assert(qw == w && qh == h && qpx.length == px.length)
      if (px.length >= 256) assert(sources.ImageCodec.psnr(px, qpx) >= 40.0)
      true
    }, n = 40)
    check(Prop.forAll(genSafeStr, Gen.chooseNum(1, 3000)) { (id0, n0) =>
      val id = "a" + id0
      val (sr, pcm) = sources.AudioCodec.decode(sources.AudioCodec.encode("pcm16", id, 8000, n0))
      assert(sr == 8000 && pcm.length == n0)
      assert(java.util.Arrays.equals(pcm.map(_.toInt), sources.AudioCodec.samples(id, n0).map(_.toInt)))
      val (_, q) = sources.AudioCodec.decode(sources.AudioCodec.encode("q8", id, 8000, n0))
      if (n0 >= 1024) assert(sources.AudioCodec.snr(sources.AudioCodec.samples(id, n0), q) >= 40.0)
      true
    }, n = 40)
  }
}
