package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bbox
import graft.oma._

/** O5M / PBF codec unit tests: varint primitives, encode/decode round
  * trips on the adversarial fixture, string-table reference behavior, and
  * the version==0 / timestamp==0 reset paths (O5MReader.basicInfo).
  */
class BinaryFormatsSpec extends AnyFunSuite {

  /** The expected parse result: the fixture with the 49-key discardable
    * filter applied and the dropped pairs counted. (Deliberately NOT the
    * XML round trip: the reference's asymmetric `(int)(0.5 + 1e7*deg)`
    * rounding shifts exact-half NEGATIVE coordinates by +1 on every XML
    * write/parse cycle, while the binary formats carry exact ints.) */
  lazy val expected: OsmInput = {
    val f = Fixtures.fixture
    var dropped = 0L
    def keep(m: Map[String, String]) = {
      val k = m.filterNot(t => OsmXml.Discardable(t._1)); dropped += m.size - k.size; k
    }
    val nodes = f.nodes.map(n => n.copy(tags = keep(n.tags)))
    val ways = f.ways.map(w => w.copy(tags = keep(w.tags)))
    val rels = f.rels.map(r => r.copy(tags = keep(r.tags)))
    OsmInput(f.bounds, nodes, ways, rels, dropped)
  }

  test("varint round trip incl. zigzag edge values") {
    val vals = Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 127L, 128L, 16383L, 16384L,
      Int.MaxValue.toLong, Int.MinValue.toLong, Long.MaxValue / 2, -(Long.MaxValue / 2))
    val o = new Varint.Out
    vals.foreach(v => o.s(v))
    vals.filter(_ >= 0).foreach(v => o.u(v))
    val in = new Varint.In(o.result())
    vals.foreach(v => assert(in.s() == v, s"s($v)"))
    vals.filter(_ >= 0).foreach(v => assert(in.u() == v, s"u($v)"))
    assert(in.atEnd)
  }

  test("reference getLength matches uLen") {
    for (v <- Seq(0L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L))
      assert(Varint.uLen(v) ==
        (if (v <= 127) 1 else if (v <= 16383) 2 else if (v <= 2097151) 3 else 4), s"uLen($v)")
  }

  def assertSameInput(got: OsmInput, want: OsmInput): Unit = {
    assert(got.bounds == want.bounds, "bounds")
    assert(got.nodes == want.nodes, "nodes")
    assert(got.ways == want.ways, "ways")
    assert(got.rels == want.rels, "relations")
    assert(got.discardedTags == want.discardedTags, "discarded-tag counter")
  }

  test("o5m round trip reproduces the XML-parsed fixture exactly") {
    val bytes = O5m.write(Fixtures.fixture)
    assert(O5m.isO5m(bytes))
    assert(!Pbf.isPbf(bytes))
    assertSameInput(O5m.decode(bytes), expected)
  }

  test("reset-ful o5m: round trip, segment skim, and parallel-merge equality") {
    val bytes = O5m.write(Fixtures.fixture, resetEvery = 3) // many mid-file resets
    // sequential decode of a reset-ful file is unchanged
    assertSameInput(O5m.decode(bytes), expected)
    // the IO-only skim finds the resets; each segment decodes independently
    val segs = O5m.segments(bytes)
    assert(segs.size >= 5, s"only ${segs.size} segments")
    assert(segs.head._1 == 0 && segs.last._2 == bytes.length)
    assert(segs.sliding(2).forall { case Seq(a, b) => a._2 == b._1 }, "gaps between segments")
    val merged = O5m.merge(segs.map { case (from, until) =>
      O5m.decode(java.util.Arrays.copyOfRange(bytes, from, until))
    })
    assertSameInput(merged, expected)
    // a file with no mid-file resets is one segment (sequential fallback)
    assert(O5m.segments(O5m.write(Fixtures.fixture)).size == 1)
  }

  test("pbf round trip reproduces the XML-parsed fixture exactly (multi-blob)") {
    val bytes = Pbf.write(Fixtures.fixture, perBlock = 16) // force several blobs
    assert(Pbf.isPbf(bytes))
    assert(!O5m.isO5m(bytes))
    val fs = Pbf.frames(bytes)
    assert(fs.head.btype == "OSMHeader")
    assert(fs.count(_.btype == "OSMData") >= 5, s"only ${fs.size} frames") // 60+ nodes / 16
    assertSameInput(Pbf.decode(bytes), expected)
  }

  test("format dispatch sniffs all three formats") {
    assertSameInput(OsmSource.read(O5m.write(Fixtures.fixture)), expected)
    assertSameInput(OsmSource.read(Pbf.write(Fixtures.fixture)), expected)
    // XML compares against its own round trip (negative-coord rounding quirk)
    val xml = OsmXml.write(Fixtures.fixture)
    assertSameInput(OsmSource.read(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      OsmXml.parse(xml))
  }

  test("o5m string-pair table: repeated pairs become back-references") {
    def node(id: Long, tags: Map[String, String]) =
      OsmNode(Meta(id, 1, 1577836800L + id, 100 + id, 7, "u"), id.toInt * 1000, id.toInt * 500, tags)
    val tag = "repeated_key_xyz" -> "repeated_value_xyz"
    val in3 = OsmInput(None, (1L to 3L).map(i => node(i, Map(tag))), Nil, Nil)
    val bytes = O5m.write(in3)
    def countOccurrences(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.count(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    // the tag text is emitted exactly once; later nodes reference the table
    assert(countOccurrences(bytes, tag._1.getBytes("UTF-8")) == 1)
    assertSameInput(O5m.decode(bytes), in3)

    // pairs with combined length > 250 never enter the table -> repeated text
    val big = ("k" * 200) -> ("v" * 200)
    val inBig = OsmInput(None, (1L to 3L).map(i => node(i, Map(big))), Nil, Nil)
    val bytesBig = O5m.write(inBig)
    assert(countOccurrences(bytesBig, big._1.getBytes("UTF-8")) == 3)
    assertSameInput(O5m.decode(bytesBig), inBig)
  }

  test("o5m basicInfo reset paths: version==0 and timestamp==0") {
    val zeroV = OsmNode(Meta(5, 0, 0, 0, 0, ""), 100, 200, Map("a" -> "b"))
    val zeroT = OsmNode(Meta(9, 3, 0, 0, 0, ""), 300, 400, Map.empty)
    val full = OsmNode(Meta(12, 2, 1600000000L, 42, 0, "anon0uid"), -1, -2, Map.empty)
    val in = OsmInput(Some(Bbox(-10, -20, 30, 40)), Seq(zeroV, zeroT, full), Nil, Nil)
    assertSameInput(O5m.decode(O5m.write(in)), in)
  }
}
