package graft.oma

import java.io.{StringReader, StringWriter}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import graft.core.Geo

/** OSM XML ingest + deterministic fixture writer.
  *
  * Parser semantics mirror OSMXMLReader.java:54-191: coordinate scaling via
  * the asymmetric `(int)(0.5 + 1e7 * deg)` rounding, timestamps parsed as
  * `uuuu-MM-dd'T'HH:mm:ss'Z'` UTC epoch seconds, and the 49 discardable tag
  * keys dropped at ingest (ElementWithID.java:27-97). A `<bounds>` element
  * is parsed but — like the reference pipeline — ignored: the step-1 'B'
  * record is the min/max over the nodes actually read (Reunify.java:241-242).
  */
object OsmXml {

  val Discardable: Set[String] =
    graft.operators.RelationalQueries.DiscardableKeys.toSet

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss'Z'")

  def parseTimestamp(v: String): Long =
    java.time.LocalDateTime.from(tsFmt.parse(v)).toEpochSecond(java.time.ZoneOffset.UTC)

  def parse(xml: String): OsmInput = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(new StringReader(xml))
    val nodes = Seq.newBuilder[OsmNode]
    val ways = Seq.newBuilder[OsmWay]
    val rels = Seq.newBuilder[OsmRelation]
    var bounds: Option[graft.core.Bbox] = None

    // reference quirk preserved: attribute state persists across elements
    var lon = 0; var lat = 0
    var id = 0L; var version = 0; var timestamp = 0L; var changeset = 0L
    var uid = 0; var user = ""
    var tags = Map.newBuilder[String, String]
    var nds = Seq.newBuilder[Long]
    var members = Seq.newBuilder[OsmMember]
    var discarded = 0L
    def keepTags(m: Map[String, String]): Map[String, String] = {
      val kept = m.filterNot(t => Discardable(t._1))
      discarded += m.size - kept.size
      kept
    }

    def basic(name: String, value: String): Unit = name match {
      case "id" => id = value.toLong
      case "version" => version = value.toInt
      case "timestamp" => timestamp = parseTimestamp(value)
      case "changeset" => changeset = value.toLong
      case "uid" => uid = value.toInt
      case "user" => user = value
      case _ =>
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "node" =>
              for (i <- 0 until r.getAttributeCount) {
                val (n, v) = (r.getAttributeLocalName(i), r.getAttributeValue(i))
                if (n == "lat") lat = Geo.fixedPoint(v.toDouble)
                else if (n == "lon") lon = Geo.fixedPoint(v.toDouble)
                else basic(n, v)
              }
              tags = Map.newBuilder
            case "way" =>
              for (i <- 0 until r.getAttributeCount)
                basic(r.getAttributeLocalName(i), r.getAttributeValue(i))
              tags = Map.newBuilder; nds = Seq.newBuilder
            case "relation" =>
              for (i <- 0 until r.getAttributeCount)
                basic(r.getAttributeLocalName(i), r.getAttributeValue(i))
              tags = Map.newBuilder; members = Seq.newBuilder
            case "tag" =>
              var k: String = null; var v: String = null
              for (i <- 0 until r.getAttributeCount) {
                if (r.getAttributeLocalName(i) == "k") k = r.getAttributeValue(i)
                else if (r.getAttributeLocalName(i) == "v") v = r.getAttributeValue(i)
              }
              tags += (k -> v)
            case "nd" =>
              for (i <- 0 until r.getAttributeCount)
                if (r.getAttributeLocalName(i) == "ref") nds += r.getAttributeValue(i).toLong
            case "member" =>
              var t: String = null; var ref = 0L; var role: String = null
              for (i <- 0 until r.getAttributeCount) r.getAttributeLocalName(i) match {
                case "type" => t = r.getAttributeValue(i)
                case "ref" => ref = r.getAttributeValue(i).toLong
                case "role" => role = r.getAttributeValue(i)
                case _ =>
              }
              members += OsmMember(t, ref, role)
            case "bounds" =>
              var (mnlo, mnla, mxlo, mxla) = (0, 0, 0, 0)
              for (i <- 0 until r.getAttributeCount) r.getAttributeLocalName(i) match {
                case "minlon" => mnlo = Geo.fixedPoint(r.getAttributeValue(i).toDouble)
                case "minlat" => mnla = Geo.fixedPoint(r.getAttributeValue(i).toDouble)
                case "maxlon" => mxlo = Geo.fixedPoint(r.getAttributeValue(i).toDouble)
                case "maxlat" => mxla = Geo.fixedPoint(r.getAttributeValue(i).toDouble)
                case _ =>
              }
              bounds = Some(graft.core.Bbox(mnlo, mnla, mxlo, mxla))
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "node" =>
              nodes += OsmNode(Meta(id, version, timestamp, changeset, uid, user),
                lon, lat, keepTags(tags.result()))
            case "way" =>
              ways += OsmWay(Meta(id, version, timestamp, changeset, uid, user),
                nds.result(), keepTags(tags.result()))
            case "relation" =>
              rels += OsmRelation(Meta(id, version, timestamp, changeset, uid, user),
                members.result(), keepTags(tags.result()))
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    OsmInput(bounds, nodes.result(), ways.result(), rels.result(), discarded)
  }

  // -------------------------------------------------------------------------
  // Deterministic fixture writer (escapes handled for the word-list values
  // we generate; ids must ascend — the reference relies on sorted input)
  // -------------------------------------------------------------------------

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  def write(input: OsmInput): String = {
    val w = new StringWriter()
    w.write("<?xml version='1.0' encoding='UTF-8'?>\n<osm version=\"0.6\">\n")
    input.bounds.foreach { b =>
      w.write(s"""<bounds minlat="${b.minLat / 1e7}" minlon="${b.minLon / 1e7}" maxlat="${b.maxLat / 1e7}" maxlon="${b.maxLon / 1e7}"/>\n""")
    }
    def meta(m: Meta): String = {
      val ts = java.time.LocalDateTime.ofEpochSecond(m.timestamp, 0, java.time.ZoneOffset.UTC)
        .format(tsFmt)
      s"""id="${m.id}" version="${m.version}" timestamp="$ts" changeset="${m.changeset}" uid="${m.uid}" user="${esc(m.user)}""""
    }
    def tagXml(tags: Map[String, String]): String =
      tags.toSeq.sortBy(_._1).map { case (k, v) => s"""<tag k="${esc(k)}" v="${esc(v)}"/>""" }.mkString
    input.nodes.foreach { n =>
      w.write(s"""<node ${meta(n.meta)} lat="${n.lat / 1e7}" lon="${n.lon / 1e7}">${tagXml(n.tags)}</node>\n""")
    }
    input.ways.foreach { wy =>
      val nds = wy.nds.map(r => s"""<nd ref="$r"/>""").mkString
      w.write(s"""<way ${meta(wy.meta)}>$nds${tagXml(wy.tags)}</way>\n""")
    }
    input.rels.foreach { rl =>
      val ms = rl.members.map(m => s"""<member type="${m.mtype}" ref="${m.ref}" role="${esc(m.role)}"/>""").mkString
      w.write(s"""<relation ${meta(rl.meta)}>$ms${tagXml(rl.tags)}</relation>\n""")
    }
    w.write("</osm>\n")
    w.toString
  }
}
