package graft.oma

import graft.core.Bbox

/** Deterministic OSM fixture + small tile grid shared by the golden tests
  * and the driver-gate pipeline queries (SURVEY.md fixture family 2).
  */
object Fixtures {

  def meta(id: Long): Meta = Meta(id, (id % 9 + 1).toInt, 1577836800L + id * 37, 7000 + id, (id % 101).toInt, s"user${id % 13}")

  /** Deterministic, reasonably adversarial fixture. Ids ascend (the
    * reference binary-searches sorted input).
    */
  def fixture: OsmInput = {
    def fp(deg: Double): Int = graft.core.Geo.fixedPoint(deg)
    var nodes = Vector.newBuilder[OsmNode]
    def node(id: Long, lon: Double, lat: Double, tags: (String, String)*): Unit =
      nodes += OsmNode(meta(id), fp(lon), fp(lat), tags.toMap)

    // tagged nodes across several tiles incl. lifecycle + discardable + unknown
    node(1, 8.5, 49.5, "amenity" -> "bench")
    node(2, 8.6, 49.6, "amenity" -> "restaurant", "created_by" -> "editorX")
    node(3, 8.7, 49.7, "highway" -> "crossing")
    node(4, 9.5, 49.5, "disused:amenity" -> "bench")
    node(5, 12.5, 55.5, "natural" -> "tree", "name" -> "Tree")
    node(6, -0.5, 51.5, "power" -> "pole")
    node(7, 2.5, 48.8, "addr:housenumber" -> "5")
    node(8, 8.5001, 49.5001, "entrance" -> "yes")
    node(9, 8.5002, 49.5002, "strange_key" -> "zz")
    node(10, 170.0, 87.0, "natural" -> "peak") // polar cap tile
    node(11, -170.0, -87.0, "natural" -> "spring")
    node(12, 8.0, 49.0, "amenity" -> "bench") // exactly on grid lines
    // untagged geometry nodes (dropped unless referenced by collections)
    for (i <- 20 to 47) {
      val (lo, la) = ((i - 20) % 7, (i - 20) / 7)
      node(i, 8.1 + lo * 0.01, 49.1 + la * 0.01)
    }
    // square ring nodes for multipolygons
    node(50, 8.20, 49.20); node(51, 8.30, 49.20); node(52, 8.30, 49.30); node(53, 8.20, 49.30)
    node(54, 8.22, 49.22); node(55, 8.28, 49.22); node(56, 8.28, 49.28); node(57, 8.22, 49.28)
    node(58, 8.40, 49.40); node(59, 8.45, 49.40); node(60, 8.45, 49.45)

    var ways = Vector.newBuilder[OsmWay]
    def way(id: Long, nds: Seq[Long], tags: (String, String)*): Unit =
      ways += OsmWay(meta(id), nds, tags.toMap)

    way(100, Seq(20, 21, 22), "highway" -> "residential")
    way(101, Seq(23, 24, 25, 23), "building" -> "yes") // closed, IS_AREA
    way(102, Seq(26, 27, 28, 26), "highway" -> "pedestrian") // closed, EXCEPTIONS member
    way(103, Seq(29, 30, 31, 29), "highway" -> "service", "area" -> "yes")
    way(104, Seq(32, 33, 34, 32), "building" -> "yes", "area" -> "no")
    way(105, Seq(35, 36), "landuse" -> "grass") // open, landuse
    way(106, Seq(37, 9999, 38), "highway" -> "track") // dangling ref -> sentinel
    way(107, Seq(39, 40, 41), "abandoned:highway" -> "residential") // lifecycle
    way(108, Seq(42, 43, 44, 42), "building" -> "yes", "amenity" -> "restaurant") // multi-key
    way(109, Seq(45, 46), "unknown_way_key" -> "1") // other block
    way(110, Seq(20, 21)) // untagged, unreferenced -> dropped
    // multipolygon pieces (untagged; still used for geometry)
    way(120, Seq(50, 51, 52)) // half ring
    way(121, Seq(52, 53, 50)) // other half
    way(122, Seq(54, 55, 56, 57, 54)) // hole ring
    way(123, Seq(58, 59, 60)) // open fragment (breaks a ring)
    // restriction pieces
    way(130, Seq(20, 21, 22), "name" -> "fromway")
    way(131, Seq(22, 23), "name" -> "toway")
    way(132, Seq(22, 24), "name" -> "toway2")

    var rels = Vector.newBuilder[OsmRelation]
    def rel(id: Long, members: Seq[OsmMember], tags: (String, String)*): Unit =
      rels += OsmRelation(meta(id), members, tags.toMap)

    rel(200, Seq(
      OsmMember("way", 120, "outer"), OsmMember("way", 121, "outer"),
      OsmMember("way", 122, "inner")),
      "type" -> "multipolygon", "landuse" -> "forest")
    rel(201, Seq( // broken ring (open fragment): contributes nothing
      OsmMember("way", 123, "outer")),
      "type" -> "boundary", "boundary" -> "administrative")
    rel(202, Seq( // extra node member -> leftover collection
      OsmMember("way", 120, "outer"), OsmMember("way", 121, "outer"),
      OsmMember("node", 5, "admin_centre")),
      "type" -> "multipolygon", "natural" -> "wood")
    rel(203, Seq(
      OsmMember("way", 130, "from"), OsmMember("node", 22, "via"),
      OsmMember("way", 131, "to")),
      "type" -> "restriction", "restriction" -> "no_left_turn")
    rel(204, Seq( // no via: inferable from shared endpoint
      OsmMember("way", 130, "from"), OsmMember("way", 131, "to")),
      "type" -> "restriction", "restriction" -> "no_u_turn")
    rel(205, Seq( // unresolvable: to missing entirely -> nothing emitted
      OsmMember("way", 130, "from"), OsmMember("node", 22, "via")),
      "type" -> "destination_sign", "destination" -> "City")
    rel(206, Seq(
      OsmMember("node", 3, "stop"), OsmMember("way", 100, ""),
      OsmMember("relation", 200, "subarea")),
      "type" -> "route", "route" -> "bus")
    rel(207, Seq(OsmMember("way", 105, "")), "unusual" -> "tag")

    OsmInput(Some(Bbox(fp(8.0), fp(49.0), fp(9.0), fp(50.0))),
      nodes.result(), ways.result(), rels.result())
  }

  val smallBbs: String =
    """60000000 100000000 10000000 480000000 510000000 10000000
      |-1800000000 1800000000 300000000 -900000000 900000000 300000000
      |""".stripMargin
}
