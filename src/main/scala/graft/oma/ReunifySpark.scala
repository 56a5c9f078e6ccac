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
  *
  * FULLY DISTRIBUTED: [[reunify(spark:org\.apache\.spark\.sql\.SparkSession,rows:org\.apache\.spark\.sql\.Dataset[graft\.oma\.OsmRow])* reunify(rows)]]
  * takes the element stream as a `Dataset[OsmRow]` (the shape the
  * o5m/pbf/oma scans emit), so a planet-scale conversion never materializes
  * the input on the driver: relation splitting, backlink grouping and the
  * per-relation metadata attachment are joins/groupBys, not driver maps.
  * Element order is the element ID within each kind — identical to input
  * order for id-sorted files. The formats merely RECOMMEND id order (every
  * planet mirror and golden fixture satisfies it); for an unsorted extract
  * this pipeline still emits id order, a deliberate, documented deviation
  * from the reference's input-order emission (the .oma chunk table indexes
  * by type/bbox, not position, so readers are unaffected). Negative or
  * oversized ids (>= 2^48) are rejected loudly rather than silently
  * scrambling the packed rank|id|sub order key.
  */
object ReunifySpark {

  val IdMarker: Long = 0x7f00000000000000L

  // intermediate row shapes (Dataset encoders need them at top level)
  final case class NodeRow(seq: Long, id: Long, lon: Int, lat: Int,
                           tags: Map[String, String], meta: Meta)
  final case class WayRow(seq: Long, id: Long, nds: Seq[Long],
                          tags: Map[String, String], meta: Meta)
  final case class RelRow(relSeq: Long, id: Long, members: Seq[OsmMember],
                          tags: Map[String, String], meta: Meta)
  final case class CollRow(relSeq: Long, id: Long, kept: Seq[OsmMember],
                           tags: Map[String, String], meta: Meta)
  final case class RelMemberRow(relSeq: Long, relId: Long, memberIdx: Int,
                                role: String, mtype: String, ref: Long)
  final case class ResolvedMember(relSeq: Long, memberIdx: Int, role: String,
                                  isNode: Boolean, lon: Seq[Int], lat: Seq[Int])
  final case class BackRow(kind: String, ref: Long, links: Seq[BackLink])
  final case class RelMetaRow(relSeq: Long, meta: Meta,
                              tags: Map[String, String], links: Seq[BackLink])
  final case class GeomPartial(relSeq: Long, sub: Int,
                               lon: Seq[Int], lat: Seq[Int],
                               holesLon: Seq[Seq[Int]], holesLat: Seq[Seq[Int]])

  def markerLon(id: Long): Int = ((IdMarker + id) >> 32).toInt
  def markerLat(id: Long): Int = (IdMarker + id).toInt

  /** Driver-materialized entry (XML parse, golden fixtures, CLI stats):
    * delegates to the distributed path over the same rows.
    */
  def reunify(spark: SparkSession, input: OsmInput): (Option[Bbox], Dataset[El]) = {
    import spark.implicits._
    reunify(spark, spark.createDataset(OsmSource.toRows(input)))
  }

  /** Full step-1 result from a distributed element stream: the input bbox
    * (the 'B' record: min/max over ALL nodes, Reunify.java:241-242) plus
    * the ordered element stream.
    *
    * The stream is consumed several times (node/way/relation splits feed
    * multiple joins) — callers holding an expensive-to-recompute source
    * (a binary scan) should persist it first, as OmaCli does.
    */
  def reunify(spark: SparkSession, rows: Dataset[OsmRow]): (Option[Bbox], Dataset[El]) = {
    import spark.implicits._

    val nodes: Dataset[NodeRow] = rows.filter(_.kind == "node").map { r =>
      NodeRow(r.id, r.id, r.lon, r.lat, r.tags,
        Meta(r.id, r.version, r.ts, r.cs, r.uid, r.user))
    }
    val ways: Dataset[WayRow] = rows.filter(_.kind == "way").map { r =>
      WayRow(r.id, r.id, r.nds, r.tags,
        Meta(r.id, r.version, r.ts, r.cs, r.uid, r.user))
    }
    val rels: Dataset[RelRow] = rows.filter(_.kind == "relation").map { r =>
      val members = r.mtypes.indices.map(i => OsmMember(r.mtypes(i), r.mrefs(i), r.mroles(i)))
      RelRow(r.id, r.id, members, r.tags,
        Meta(r.id, r.version, r.ts, r.cs, r.uid, r.user))
    }

    val bbox: Option[Bbox] = {
      val r = nodes.agg(min("lon"), min("lat"), max("lon"), max("lat")).head()
      if (r.isNullAt(0)) None
      else Some(Bbox(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    }

    // ---- relation split (P3/P4) -------------------------------------------
    def relType(tags: Map[String, String]): String = tags.getOrElse("type", null)
    def isMp(t: String): Boolean = t == "multipolygon" || t == "boundary"
    def isRestr(t: String): Boolean = t == "restriction" || t == "destination_sign"

    def mpConsumed(m: OsmMember): Boolean =
      m.mtype == "way" && (m.role == "outer" || m.role == "inner")
    def restrConsumedWay(m: OsmMember): Boolean =
      m.mtype == "way" && Set("from", "to", "via", "intersection")(m.role)
    def restrConsumedNode(m: OsmMember): Boolean =
      m.mtype == "node" && (m.role == "via" || m.role == "intersection")

    val mpRel: Dataset[RelRow] = rels.filter(r => isMp(relType(r.tags)))
    val restrRel: Dataset[RelRow] = rels.filter(r => isRestr(relType(r.tags)))

    // collections: every relation whose member list retains >= 1 member
    val collRel: Dataset[CollRow] = rels.flatMap { r =>
      val t = relType(r.tags)
      val kept = r.members.filter { m =>
        val consumed =
          (isMp(t) && mpConsumed(m)) ||
            (isRestr(t) && (restrConsumedWay(m) || restrConsumedNode(m)))
        !consumed
      }
      if (kept.isEmpty) None else Some(CollRow(r.relSeq, r.id, kept, r.tags, r.meta))
    }

    // ---- J4: membership backlinks (from collections only) -----------------
    // list order = relation id order (= input order for sorted files), then
    // member position — a distributed groupBy, never a driver map
    val backRows: Dataset[BackRow] = collRel
      .flatMap { c =>
        c.kept.zipWithIndex.map { case (m, nr) =>
          (m.mtype.substring(0, 1), m.ref, c.relSeq, BackLink(c.id, m.role, nr))
        }
      }
      .groupByKey(b => (b._1, b._2))
      .mapGroups { (key, it) =>
        val links = it.toSeq.sortBy(b => (b._3, b._4.nr)).map(_._4)
        BackRow(key._1, key._2, links)
      }
    val blNodes = backRows.filter(_.kind == "n")
    val blWays = backRows.filter(_.kind == "w")
    val blRels = backRows.filter(_.kind == "r")

    /** relation metadata + its own backlinks, joined (not broadcast from a
      * driver map) so the per-relation attachment scales with the data. */
    def relMetaOf(relDs: Dataset[RelRow]): Dataset[RelMetaRow] =
      relDs.joinWith(blRels, relDs("id") === blRels("ref"), "left_outer")
        .map { case (r, bl) =>
          RelMetaRow(r.relSeq, r.meta, r.tags, Option(bl).map(_.links).getOrElse(Nil))
        }

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

    def resolveMembers(relDs: Dataset[RelRow], wayFilter: OsmMember => Boolean,
                       nodeFilter: OsmMember => Boolean): Dataset[ResolvedMember] = {
      // member order on the wire: all way members first, then node members
      // (Reunify.java:332-348) — memberIdx reflects that emission order
      val ds: Dataset[RelMemberRow] = relDs.flatMap { r =>
        val wm = r.members.filter(wayFilter).map(m => (m, false))
        val nm = r.members.filter(nodeFilter).map(m => (m, true))
        (wm ++ nm).zipWithIndex.map { case ((m, isNode), mi) =>
          RelMemberRow(r.relSeq, r.id, mi, m.role, if (isNode) "node" else "way", m.ref)
        }
      }
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
    // assemble per relation (flatMapGroups), then JOIN the relation's
    // meta/tags/backlinks on — the former driver-side broadcast map of all
    // relation metadata is gone
    val mpMembers = resolveMembers(mpRel, mpConsumed, _ => false)
    val areaParts: Dataset[GeomPartial] = mpMembers
      .groupByKey(_.relSeq)
      .flatMapGroups { (relSeq, it) =>
        val ms = it.toIndexedSeq.sortBy(_.memberIdx)
        val outer = ms.filter(_.role != "inner").map(m => (m.lon.toArray, m.lat.toArray))
        val inner = ms.filter(_.role == "inner").map(m => (m.lon.toArray, m.lat.toArray))
        val areas = Assembly.sortRings(Assembly.createRings(outer), Assembly.createRings(inner))
        areas.zipWithIndex.map { case (a, ai) =>
          // the closing duplicate vertex is stripped on write (rings keep it
          // through nesting; Reunify.java:1240-1255)
          GeomPartial(relSeq, ai, a.lon.dropRight(1).toSeq, a.lat.dropRight(1).toSeq,
            a.holesLon.map(_.dropRight(1).toSeq).toSeq, a.holesLat.map(_.dropRight(1).toSeq).toSeq)
        }
      }
    val mpMeta = relMetaOf(mpRel)
    val elAreas: Dataset[El] = areaParts
      .joinWith(mpMeta, areaParts("relSeq") === mpMeta("relSeq"))
      .map { case (p, m) =>
        El("A", p.relSeq, p.sub, m.meta,
          p.lon.toArray, p.lat.toArray,
          p.holesLon.map(_.toArray).toArray, p.holesLat.map(_.toArray).toArray,
          m.tags, m.links.toArray)
      }

    // ---- G5: restriction path assembly -> synthetic Ways ------------------
    val restrMembers = resolveMembers(restrRel, restrConsumedWay, restrConsumedNode)
    val wayParts: Dataset[GeomPartial] = restrMembers
      .groupByKey(_.relSeq)
      .flatMapGroups { (relSeq, it) =>
        val ms = it.toIndexedSeq.sortBy(_.memberIdx)
        def pts(m: ResolvedMember): Array[(Int, Int)] = m.lon.zip(m.lat).toArray
        val from = ms.filter(m => !m.isNode && m.role == "from").map(pts)
        val to = ms.filter(m => !m.isNode && m.role == "to").map(pts)
        val via = ms.filter(m => (!m.isNode && m.role != "from" && m.role != "to") || m.isNode).map(pts)
        val ways = Assembly.createWays(from, via, to)
        ways.zipWithIndex.map { case ((lon, lat), wi) =>
          GeomPartial(relSeq, wi, lon.toSeq, lat.toSeq, Nil, Nil)
        }
      }
    val restrMeta = relMetaOf(restrRel)
    val elRelWays: Dataset[El] = wayParts
      .joinWith(restrMeta, wayParts("relSeq") === restrMeta("relSeq"))
      .map { case (p, m) =>
        El("W", p.relSeq, p.sub, m.meta, p.lon.toArray, p.lat.toArray,
          Array.empty, Array.empty, m.tags, m.links.toArray)
      }

    // ---- C: collections ----------------------------------------------------
    val elColls: Dataset[El] = collRel
      .joinWith(blRels, collRel("id") === blRels("ref"), "left_outer")
      .map { case (c, bl) =>
        El("C", c.relSeq, 0, c.meta, Array.empty, Array.empty, Array.empty, Array.empty,
          c.tags, Option(bl).map(_.links).getOrElse(Nil).toArray)
      }

    // ---- interleave in the reference's emission order ----------------------
    // N* then plain W*, synthetic W*, A*, C* — encode a global order key:
    // 3 bits stream rank | 48 bits element id | 12 bits sub-piece. The id
    // field carries real OSM ids (up to 2^48 ~ 2.8e14 — two orders of
    // magnitude above today's planet), unlike the former 28-bit input-index
    // packing which capped a file at 268M elements.
    def withOrder(ds: Dataset[El], rank: Int): Dataset[El] =
      ds.map { e =>
        // reject NEGATIVE ids too (common in synthetic/renumbered extracts):
        // a negative id would sign-extend across the rank bits and silently
        // scramble emission order instead of failing loudly
        require(e.seq >= 0 && e.seq < (1L << 48) && e.sub >= 0 && e.sub < (1 << 12),
          s"order-key overflow: id=${e.seq} sub=${e.sub}")
        e.copy(seq = (rank.toLong << 60) | (e.seq << 12) | e.sub)
      }
    val all = withOrder(elNodes, 0)
      .unionByName(withOrder(elWays, 1))
      .unionByName(withOrder(elRelWays, 2))
      .unionByName(withOrder(elAreas, 3))
      .unionByName(withOrder(elColls, 4))
    (bbox, all)
  }
}
