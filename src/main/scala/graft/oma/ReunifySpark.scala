package graft.oma

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Bbox

/** Step 1 (Reunify) as a Spark pipeline: the reference's hand-rolled
  * out-of-core joins become declarative shuffle joins —
  *   J1 node-location join   (Reunify.java:266-281, 434-447)
  *   J3 way-geometry join    (Reunify.java:676-841)
  *   J4 membership backlinks (Reunify.java:869-930)
  * with the relation split (P3/P4, Reunify.java:283-373), geometry assembly
  * (G4/G5) in flatMapGroups, and the untagged-unreferenced drop (P2).
  * The multi-pass memory-bounded repair loops (J2) are deliberately not
  * ported: one shuffle join replaces k passes.
  */
object ReunifySpark {

  val IdMarker: Long = 0x7f00000000000000L

  // intermediate row shapes (Dataset encoders need them at top level)
  final case class NodeRow(seq: Long, id: Long, lon: Int, lat: Int,
                           tags: Map[String, String], meta: Meta)
  final case class WayRow(seq: Long, id: Long, nds: Seq[Long],
                          tags: Map[String, String], meta: Meta)
  final case class RelMemberRow(relSeq: Long, relId: Long, memberIdx: Int,
                                role: String, mtype: String, ref: Long)
  final case class RelInfo(relSeq: Long, relId: Long, branch: String, // mp | restr | coll
                           tags: Map[String, String], meta: Meta)
  final case class ResolvedMember(relSeq: Long, memberIdx: Int, role: String,
                                  isNode: Boolean, lon: Seq[Int], lat: Seq[Int])
  final case class BackRow(kind: String, ref: Long, links: Seq[BackLink])

  def markerLon(id: Long): Int = ((IdMarker + id) >> 32).toInt
  def markerLat(id: Long): Int = (IdMarker + id).toInt

  /** Full step-1 result: the input bbox (the 'B' record: min/max over ALL
    * nodes, Reunify.java:241-242) plus the ordered element stream.
    */
  def reunify(spark: SparkSession, input: OsmInput): (Option[Bbox], Dataset[El]) = {
    import spark.implicits._

    val nodes: Dataset[NodeRow] = spark.createDataset(
      input.nodes.zipWithIndex.map { case (n, i) => NodeRow(i.toLong, n.meta.id, n.lon, n.lat, n.tags, n.meta) })
    val ways: Dataset[WayRow] = spark.createDataset(
      input.ways.zipWithIndex.map { case (w, i) => WayRow(i.toLong, w.meta.id, w.nds, w.tags, w.meta) })

    val bbox: Option[Bbox] =
      if (input.nodes.isEmpty) None
      else {
        val r = nodes.agg(min("lon"), min("lat"), max("lon"), max("lat")).head()
        Some(Bbox(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      }

    // ---- relation split (P3/P4) -------------------------------------------
    // classify each relation and mark consumed members, all order-preserving
    val relRows = input.rels.zipWithIndex
    def relType(r: OsmRelation): String = r.tags.getOrElse("type", null)

    val mpRel = relRows.filter { case (r, _) =>
      val t = relType(r); t == "multipolygon" || t == "boundary" }
    val restrRel = relRows.filter { case (r, _) =>
      val t = relType(r); t == "restriction" || t == "destination_sign" }

    def mpConsumed(m: OsmMember): Boolean =
      m.mtype == "way" && (m.role == "outer" || m.role == "inner")
    def restrConsumedWay(m: OsmMember): Boolean =
      m.mtype == "way" && Set("from", "to", "via", "intersection")(m.role)
    def restrConsumedNode(m: OsmMember): Boolean =
      m.mtype == "node" && (m.role == "via" || m.role == "intersection")

    // collections: every relation whose member list retains >= 1 member
    val collRel = relRows.flatMap { case (r, i) =>
      val t = relType(r)
      val kept = r.members.filter { m =>
        val consumed =
          ((t == "multipolygon" || t == "boundary") && mpConsumed(m)) ||
            ((t == "restriction" || t == "destination_sign") && (restrConsumedWay(m) || restrConsumedNode(m)))
        !consumed
      }
      if (kept.isEmpty) None else Some((r, i.toLong, kept))
    }

    // ---- J4: membership backlinks (from collections only) -----------------
    // list order = relation input order, then member position
    val backlinks: Map[(String, Long), Seq[BackLink]] = {
      val all = collRel.flatMap { case (r, relSeq, kept) =>
        kept.zipWithIndex.map { case (m, nr) =>
          ((m.mtype.substring(0, 1), m.ref), (relSeq, BackLink(r.meta.id, m.role, nr)))
        }
      }
      all.groupBy(_._1).map { case (k, vs) => k -> vs.sortBy(_._2._1).map(_._2._2) }
    }
    val blNodes: Dataset[BackRow] = spark.createDataset(
      backlinks.collect { case (("n", ref), ls) => BackRow("n", ref, ls) }.toSeq)
    val blWays: Dataset[BackRow] = spark.createDataset(
      backlinks.collect { case (("w", ref), ls) => BackRow("w", ref, ls) }.toSeq)
    def blRel(id: Long): Seq[BackLink] = backlinks.getOrElse(("r", id), Nil)

    // ---- N: nodes + backlinks, untagged-unreferenced drop (P2) ------------
    val elNodes: Dataset[El] = nodes
      .joinWith(blNodes, nodes("id") === blNodes("ref"), "left_outer")
      .map { case (n, bl) =>
        val links = Option(bl).map(_.links).getOrElse(Nil)
        El("N", n.seq, 0, n.meta, Array(n.lon), Array(n.lat),
          Array.empty, Array.empty, n.tags, links.toArray)
      }
      .filter(e => e.tags.nonEmpty || e.members.nonEmpty)

    // ---- J1: node-location join for plain ways ----------------------------
    // explode refs, join node coords, regroup preserving ref order; misses
    // collapse to the MAX_VALUE sentinel (step-2 semantics,
    // ChunkGenerator.java:326-327 — nothing reads plain-way coords between)
    val wayRefs = ways.flatMap(w => w.nds.zipWithIndex.map { case (ref, p) => (w.seq, p, ref) })
      .toDF("wseq", "pos", "ref")
    val coords = nodes.select(col("id").as("nid"), col("lon"), col("lat"))
    val resolved = wayRefs.join(coords, col("ref") === col("nid"), "left")
      .groupBy("wseq")
      .agg(sort_array(collect_list(struct(col("pos"), col("lon"), col("lat")))).as("pts"))
      .as[(Long, Seq[(Int, Option[Int], Option[Int])])]

    val elWays: Dataset[El] = ways
      .joinWith(resolved, ways("seq") === resolved("wseq"), "left_outer")
      .joinWith(blWays, col("_1.id") === blWays("ref"), "left_outer")
      .map { case ((w, pts), bl) =>
        val ps = Option(pts).map(_._2).getOrElse(Nil)
        val lon = ps.map(p => if (p._2.isEmpty) Int.MaxValue else p._2.get).toArray
        val lat = ps.map(p => if (p._2.isEmpty) Int.MaxValue else p._3.get).toArray
        val links = Option(bl).map(_.links).getOrElse(Nil)
        El("W", w.seq, 0, w.meta, lon, lat, Array.empty, Array.empty, w.tags, links.toArray)
      }
      .filter(e => e.tags.nonEmpty || e.members.nonEmpty)

    // ---- J3: member-way geometry for relations ----------------------------
    // member ways carry per-node markers for missing nodes (the assembly
    // sees marker coords, exactly like addRelationAreas reading raw ints)
    val wayGeo = ways.flatMap(w => w.nds.zipWithIndex.map { case (ref, p) => (w.id, w.seq, p, ref) })
      .toDF("gwid", "gwseq", "gpos", "gref")
      .join(coords, col("gref") === col("nid"), "left")
      .groupBy("gwid", "gwseq")
      .agg(sort_array(collect_list(struct(col("gpos"), col("gref"), col("lon"), col("lat")))).as("gpts"))
      .select(col("gwid"), col("gpts"))
      .as[(Long, Seq[(Int, Long, Option[Int], Option[Int])])]
      .map { case (wid, pts) =>
        val lon = pts.map(p => p._3.getOrElse(markerLon(p._2)))
        val lat = pts.map(p => if (p._3.isEmpty) markerLat(p._2) else p._4.get)
        (wid, lon, lat)
      }
      .toDF("gwid", "glon", "glat")

    def resolveMembers(rels: Seq[(OsmRelation, Int)], wayFilter: OsmMember => Boolean,
                       nodeFilter: OsmMember => Boolean): Dataset[ResolvedMember] = {
      // member order on the wire: all way members first, then node members
      // (Reunify.java:332-348) — memberIdx reflects that emission order
      val rows = rels.flatMap { case (r, i) =>
        val wm = r.members.filter(wayFilter).map(m => (m, false))
        val nm = r.members.filter(nodeFilter).map(m => (m, true))
        (wm ++ nm).zipWithIndex.map { case ((m, isNode), mi) =>
          RelMemberRow(i.toLong, r.meta.id, mi, m.role, if (isNode) "node" else "way", m.ref)
        }
      }
      val ds = spark.createDataset(rows)
      val wayMembers = ds.filter(_.mtype == "way").toDF()
        .join(wayGeo, col("ref") === col("gwid"), "left")
        .as[(Long, Long, Int, String, String, Long, Option[Long], Option[Seq[Int]], Option[Seq[Int]])]
        .flatMap { case (relSeq, _, mi, role, _, _, gwid, glon, glat) =>
          // unresolved way members are skipped at assembly (type stays 'w')
          if (gwid.isEmpty) None
          else Some(ResolvedMember(relSeq, mi, role, isNode = false, glon.get, glat.get))
        }
      val nodeMembers = ds.filter(_.mtype == "node").toDF()
        .join(coords, col("ref") === col("nid"), "left")
        .as[(Long, Long, Int, String, String, Long, Option[Long], Option[Int], Option[Int])]
        .map { case (relSeq, _, mi, role, _, ref, nid, lo, la) =>
          // missing node member arrives as the raw marker pair
          if (nid.isEmpty) ResolvedMember(relSeq, mi, role, isNode = true,
            Seq(markerLon(ref)), Seq(markerLat(ref)))
          else ResolvedMember(relSeq, mi, role, isNode = true, Seq(lo.get), Seq(la.get))
        }
      wayMembers.unionByName(nodeMembers)
    }

    // ---- G4: multipolygon assembly -> Areas -------------------------------
    val mpInfo = mpRel.map { case (r, i) => i.toLong -> (r.meta, r.tags, blRel(r.meta.id)) }.toMap
    val mpInfoB = spark.sparkContext.broadcast(mpInfo)
    val mpMembers = resolveMembers(mpRel, mpConsumed, _ => false)
    val elAreas: Dataset[El] = mpMembers
      .groupByKey(_.relSeq)
      .flatMapGroups { (relSeq, it) =>
        val ms = it.toIndexedSeq.sortBy(_.memberIdx)
        val outer = ms.filter(_.role != "inner").map(m => (m.lon.toArray, m.lat.toArray))
        val inner = ms.filter(_.role == "inner").map(m => (m.lon.toArray, m.lat.toArray))
        val areas = Assembly.sortRings(Assembly.createRings(outer), Assembly.createRings(inner))
        val (meta, tags, links) = mpInfoB.value(relSeq)
        areas.zipWithIndex.map { case (a, ai) =>
          // the closing duplicate vertex is stripped on write (rings keep it
          // through nesting; Reunify.java:1240-1255)
          El("A", relSeq, ai, meta,
            a.lon.dropRight(1), a.lat.dropRight(1),
            a.holesLon.map(_.dropRight(1)), a.holesLat.map(_.dropRight(1)),
            tags, links.toArray)
        }
      }

    // ---- G5: restriction path assembly -> synthetic Ways ------------------
    val restrInfo = restrRel.map { case (r, i) => i.toLong -> (r.meta, r.tags, blRel(r.meta.id)) }.toMap
    val restrInfoB = spark.sparkContext.broadcast(restrInfo)
    val restrMembers = resolveMembers(restrRel, restrConsumedWay, restrConsumedNode)
    val elRelWays: Dataset[El] = restrMembers
      .groupByKey(_.relSeq)
      .flatMapGroups { (relSeq, it) =>
        val ms = it.toIndexedSeq.sortBy(_.memberIdx)
        def pts(m: ResolvedMember): Array[(Int, Int)] = m.lon.zip(m.lat).toArray
        val from = ms.filter(m => !m.isNode && m.role == "from").map(pts)
        val to = ms.filter(m => !m.isNode && m.role == "to").map(pts)
        val via = ms.filter(m => (!m.isNode && m.role != "from" && m.role != "to") || m.isNode).map(pts)
        val ways = Assembly.createWays(from, via, to)
        val (meta, tags, links) = restrInfoB.value(relSeq)
        ways.zipWithIndex.map { case ((lon, lat), wi) =>
          El("W", relSeq, wi, meta, lon, lat, Array.empty, Array.empty, tags, links.toArray)
        }
      }

    // ---- C: collections ----------------------------------------------------
    val elColls: Dataset[El] = spark.createDataset(
      collRel.map { case (r, relSeq, _) =>
        El("C", relSeq, 0, r.meta, Array.empty, Array.empty, Array.empty, Array.empty,
          r.tags, blRel(r.meta.id).toArray)
      })

    // ---- interleave in the reference's emission order ----------------------
    // N* then plain W*, synthetic W*, A*, C* — encode a global order key
    def withOrder(ds: Dataset[El], rank: Int): Dataset[El] =
      ds.map(e => e.copy(seq = (rank.toLong << 40) | (e.seq << 12) | e.sub))
    val all = withOrder(elNodes, 0)
      .unionByName(withOrder(elWays, 1))
      .unionByName(withOrder(elRelWays, 2))
      .unionByName(withOrder(elAreas, 3))
      .unionByName(withOrder(elColls, 4))
    (bbox, all)
  }
}
