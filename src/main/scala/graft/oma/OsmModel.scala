package graft.oma

/** Input-side OSM model (reference: OSMNode/OSMWay/OSMRelation/OSMMember)
  * and the engine's internal element form flowing through the pipeline.
  * Coordinates are int32 1e-7 deg fixed point throughout.
  */
final case class OsmMember(mtype: String, ref: Long, role: String)

final case class Meta(id: Long, version: Int, timestamp: Long,
                      changeset: Long, uid: Int, user: String)

final case class OsmNode(meta: Meta, lon: Int, lat: Int, tags: Map[String, String])
final case class OsmWay(meta: Meta, nds: Seq[Long], tags: Map[String, String])
final case class OsmRelation(meta: Meta, members: Seq[OsmMember], tags: Map[String, String])

/** @param discardedTags count of tag pairs dropped by the 49-key discard
  *                       filter at ingest — the reference's A4 counter
  *                       (ElementWithID.java:27-97), surfaced explicitly. */
final case class OsmInput(bounds: Option[graft.core.Bbox],
                          nodes: Seq[OsmNode], ways: Seq[OsmWay], rels: Seq[OsmRelation],
                          discardedTags: Long = 0L)

/** Reverse membership link (reference Member.java): the id is the OWNING
  * collection-relation's id; nr is the member's position inside it.
  */
final case class BackLink(relId: Long, role: String, nr: Int)

/** One reunified element (the step-1 record): kind N/W/A/C.
  * `seq` orders elements exactly as the reference emits them (input order
  * within each kind; areas/synthetic ways inherit their relation's order
  * with a sub-index per emitted piece).
  */
final case class El(
    kind: String, // "N" | "W" | "A" | "C"
    seq: Long,
    sub: Int,
    meta: Meta,
    lon: Array[Int], lat: Array[Int],
    holesLon: Array[Array[Int]], holesLat: Array[Array[Int]],
    tags: Map[String, String],
    members: Array[BackLink])

object El {
  /** Canonical comparable form: geometry + tag SET (reference HashMap order
    * is nondeterministic) + members + meta. Used for golden multiset diffs.
    */
  def canonical(kind: String, lon: Seq[Int], lat: Seq[Int],
                holesLon: Seq[Seq[Int]], holesLat: Seq[Seq[Int]],
                tags: Map[String, String], members: Seq[BackLink],
                meta: Option[Meta]): String = {
    val geo = lon.zip(lat).map { case (x, y) => s"$x,$y" }.mkString(";")
    val holes = holesLon.zip(holesLat).map { case (hx, hy) =>
      hx.zip(hy).map { case (x, y) => s"$x,$y" }.mkString(";")
    }.mkString("|")
    val tagStr = tags.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    val memStr = members.map(m => s"${m.relId}/${m.role}/${m.nr}").mkString(",")
    val metaStr = meta.map(m => s"${m.id}:${m.version}:${m.timestamp}:${m.changeset}:${m.uid}:${m.user}")
      .getOrElse("")
    s"$kind[$geo][$holes][$tagStr][$memStr][$metaStr]"
  }
}
