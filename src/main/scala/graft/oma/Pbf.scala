package graft.oma

import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}
import graft.core.Bbox
import graft.oma.Varint.{In, Out}

/** PBF reader + writer (reference PBFReader.java:32-362 semantics).
  *
  * The format is a sequence of independently-decodable blobs: a 4-byte
  * big-endian length, a protobuf BlobHeader {1:type, 3:datasize}, then
  * `datasize` bytes of Blob {2:raw_size, 3:zlib data} wrapping either an
  * OSMHeader (HeaderBlock {1:bbox, 4:required features}) or an OSMData
  * PrimitiveBlock {1:string table, 2:primitive group} with DenseNodes /
  * Way / Relation messages. Every OSMData blob carries its OWN string table
  * and delta state — blobs are the natural parallel unit, which is exactly
  * how [[elements]] fans the scan out across executors.
  *
  * Like the reference, coordinates use the default granularity 100
  * (raw value == 1e-7 degrees; the reference rejects blocks that carry an
  * explicit granularity field) and timestamps the default date granularity
  * (raw value == epoch seconds).
  *
  * The writer emits the dialect the reference reads — zlib-compressed
  * blobs, one PrimitiveGroup per block, a DenseInfo on every dense-node
  * block, Info on every way/relation, and nodes/ways/relations in separate
  * blobs (the reference's group cursor ends the whole blob when a dense run
  * returns null) — and is diffed against `oma.jar` in BinaryGoldenSpec.
  */
object Pbf {

  private val MemberTypes = Array("node", "way", "relation")

  /** Tools.java:22 PBF_SIGNATUR: 4-byte length, then the BlobHeader must
    * start `0a 09 "OSM"` — i.e. first field type="OSMHeader". */
  def isPbf(bytes: Array[Byte]): Boolean =
    bytes.length >= 9 && bytes(4) == 0x0a && bytes(5) == 0x09 &&
      bytes(6) == 'O' && bytes(7) == 'S' && bytes(8) == 'M'

  /** One blob's frame coordinates inside the file (metadata only). */
  final case class Frame(btype: String, offset: Long, len: Int)

  // -------------------------------------------------------------------------
  // Protobuf-subset primitives
  // -------------------------------------------------------------------------

  /** Iterate a message's fields: cb(fieldNr, wireType, cursor-positioned-at-value). */
  private def fields(in: In)(cb: (Int, Int) => Unit): Unit =
    while (!in.atEnd) {
      val key = in.u()
      cb((key >> 3).toInt, (key & 7).toInt)
    }

  private def lenDelim(in: In): In = in.sub(in.u().toInt)

  private def str(in: In): String = {
    val b = lenDelim(in)
    new String(b.buf, b.pos, b.end - b.pos, StandardCharsets.UTF_8)
  }

  private def skip(in: In, wire: Int): Unit = wire match {
    case 0 => in.u()
    case 2 => lenDelim(in)
    case 5 => in.bytes(4)
    case 1 => in.bytes(8)
    case w => sys.error(s"unsupported wire type $w")
  }

  private def zlibInflate(data: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (off < rawSize && !inf.finished()) off += inf.inflate(out, off, rawSize - off)
    inf.end()
    require(off == rawSize, s"blob raw_size $rawSize but inflated $off")
    out
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // -------------------------------------------------------------------------
  // Frame scan (driver-side, metadata only — bodies are skipped)
  // -------------------------------------------------------------------------

  def frames(bytes: Array[Byte]): Seq[Frame] = {
    val in = new In(bytes)
    val out = Seq.newBuilder[Frame]
    while (!in.atEnd) {
      val hlen = in.int32()
      val header = in.sub(hlen)
      var btype = ""; var datasize = 0
      fields(header) {
        case (1, _) => btype = str(header)
        case (3, _) => datasize = header.u().toInt
        case (_, w) => skip(header, w)
      }
      out += Frame(btype, in.pos.toLong, datasize)
      in.sub(datasize) // skip body
    }
    out.result()
  }

  /** Streaming frame skim with Long offsets — the planet-scale driver path
    * (OsmSource.pbfScan): reads each 4-byte length + BlobHeader (tens of
    * bytes), then SKIPS the body, so driver memory is O(largest header) and
    * input files are not capped at the 2 GiB JVM array limit of the byte[]
    * overload. This is the reference's own frame loop (PBFReader.java:32-60:
    * readInt, read header, consume blob) minus the body decode.
    */
  def framesStream(in: java.io.InputStream, total: Long): Seq[Frame] = {
    import graft.sources.RangeStore.{readFully, skipFully}
    var pos = 0L
    def byte(): Int = {
      val b = in.read()
      require(b >= 0, s"unexpected EOF at $pos of $total")
      pos += 1
      b
    }
    val out = Seq.newBuilder[Frame]
    while (pos < total) {
      val hlen = (byte() << 24) | (byte() << 16) | (byte() << 8) | byte()
      require(hlen >= 0 && pos + hlen <= total,
        s"malformed PBF blob header length $hlen at ${pos - 4}")
      val hdr = new Array[Byte](hlen)
      readFully(in, hdr, hlen)
      pos += hlen
      val header = new In(hdr)
      var btype = ""; var datasize = 0
      fields(header) {
        case (1, _) => btype = str(header)
        case (3, _) => datasize = header.u().toInt
        case (_, w) => skip(header, w)
      }
      require(datasize >= 0 && pos + datasize <= total,
        s"malformed PBF blob: datasize $datasize at $pos exceeds file of $total")
      out += Frame(btype, pos, datasize)
      skipFully(in, datasize)
      pos += datasize
    }
    out.result()
  }

  // -------------------------------------------------------------------------
  // Blob decode (independent per blob — the executor-side unit)
  // -------------------------------------------------------------------------

  /** Unwrap Blob {2: raw_size, 3: zlib} to the raw block bytes. */
  def unwrapBlob(blob: Array[Byte]): Array[Byte] = {
    val in = new In(blob)
    var rawSize = -1
    var data: Array[Byte] = null
    fields(in) {
      case (2, _) => rawSize = in.u().toInt
      case (3, _) => val b = lenDelim(in); data = b.bytes(b.end - b.pos)
      case (1, _) => val b = lenDelim(in); data = b.bytes(b.end - b.pos); rawSize = -2 // uncompressed
      case (_, w) => skip(in, w)
    }
    require(data != null, "blob carries no data field")
    if (rawSize == -2) data else zlibInflate(data, rawSize)
  }

  def decodeHeaderBlock(block: Array[Byte]): Option[Bbox] = {
    val in = new In(block)
    var bounds: Option[Bbox] = None
    fields(in) {
      case (1, _) =>
        val bb = lenDelim(in)
        var left = 0L; var right = 0L; var top = 0L; var bottom = 0L
        fields(bb) {
          case (1, _) => left = bb.s()
          case (2, _) => right = bb.s()
          case (3, _) => top = bb.s()
          case (4, _) => bottom = bb.s()
          case (_, w) => skip(bb, w)
        }
        // nanodegrees -> 1e-7 deg (PBFReader HeaderBBox.getBounds)
        bounds = Some(Bbox((left / 100).toInt, (bottom / 100).toInt,
          (right / 100).toInt, (top / 100).toInt))
      case (_, w) => skip(in, w)
    }
    bounds
  }

  /** Decode one OSMData block into raw (unfiltered-tags) elements. */
  def decodePrimitiveBlock(block: Array[Byte]): (Seq[OsmNode], Seq[OsmWay], Seq[OsmRelation]) = {
    val in = new In(block)
    var st = Vector.empty[String]
    val groups = Seq.newBuilder[In]
    fields(in) {
      case (1, _) =>
        val stIn = lenDelim(in)
        fields(stIn) {
          case (1, _) => st :+= str(stIn)
          case (_, w) => skip(stIn, w)
        }
      case (2, _) => groups += lenDelim(in)
      case (_, w) => skip(in, w)
    }

    val nodes = Seq.newBuilder[OsmNode]
    val ways = Seq.newBuilder[OsmWay]
    val rels = Seq.newBuilder[OsmRelation]

    def packed(cur: In): In = cur // packed fields are just length-delimited varint runs

    def info(iIn: In): Meta = {
      var version = 0; var ts = 0L; var cs = 0L; var uid = 0; var user = 0
      fields(iIn) {
        case (1, _) => version = iIn.u().toInt
        case (2, _) => ts = iIn.u()
        case (3, _) => cs = iIn.u()
        case (4, _) => uid = iIn.u().toInt
        case (5, _) => user = iIn.u().toInt
        case (_, w) => skip(iIn, w)
      }
      Meta(0L, version, ts, cs, uid, if (user < st.size) st(user) else "")
    }

    groups.result().foreach { g =>
      fields(g) {
        case (2, _) => // DenseNodes
          val dn = lenDelim(g)
          var ids: In = null; var lats: In = null; var lons: In = null; var kvs: In = null
          var versions: In = null; var tss: In = null; var css: In = null
          var uids: In = null; var users: In = null
          fields(dn) {
            case (1, _) => ids = packed(lenDelim(dn))
            case (5, _) =>
              val di = lenDelim(dn)
              fields(di) {
                case (1, _) => versions = packed(lenDelim(di))
                case (2, _) => tss = packed(lenDelim(di))
                case (3, _) => css = packed(lenDelim(di))
                case (4, _) => uids = packed(lenDelim(di))
                case (5, _) => users = packed(lenDelim(di))
                case (_, w) => skip(di, w)
              }
            case (8, _) => lats = packed(lenDelim(dn))
            case (9, _) => lons = packed(lenDelim(dn))
            case (10, _) => kvs = packed(lenDelim(dn))
            case (_, w) => skip(dn, w)
          }
          var id = 0L; var lat = 0L; var lon = 0L
          var ts = 0L; var cs = 0L; var uid = 0L; var user = 0L
          while (ids != null && !ids.atEnd) {
            id += ids.s(); lat += lats.s(); lon += lons.s()
            val version = versions.u().toInt
            ts += tss.s(); cs += css.s(); uid += uids.s(); user += users.s()
            val tags = Map.newBuilder[String, String]
            if (kvs != null) {
              var k = if (kvs.atEnd) 0 else kvs.u().toInt
              while (k != 0) {
                tags += (st(k) -> st(kvs.u().toInt))
                k = if (kvs.atEnd) 0 else kvs.u().toInt
              }
            }
            nodes += OsmNode(Meta(id, version, ts, cs, uid.toInt, st(user.toInt)),
              lon.toInt, lat.toInt, tags.result())
          }
        case (3, _) => // Way
          val wIn = lenDelim(g)
          var id = 0L; var meta = Meta(0, 0, 0, 0, 0, "")
          var keys: In = null; var vals: In = null; var refs: In = null
          fields(wIn) {
            case (1, _) => id = wIn.u()
            case (2, _) => keys = packed(lenDelim(wIn))
            case (3, _) => vals = packed(lenDelim(wIn))
            case (4, _) => meta = info(lenDelim(wIn))
            case (8, _) => refs = packed(lenDelim(wIn))
            case (_, w) => skip(wIn, w)
          }
          val tags = Map.newBuilder[String, String]
          if (keys != null) while (!keys.atEnd) tags += (st(keys.u().toInt) -> st(vals.u().toInt))
          val nds = Seq.newBuilder[Long]
          var ref = 0L
          if (refs != null) while (!refs.atEnd) { ref += refs.s(); nds += ref }
          ways += OsmWay(meta.copy(id = id), nds.result(), tags.result())
        case (4, _) => // Relation
          val rIn = lenDelim(g)
          var id = 0L; var meta = Meta(0, 0, 0, 0, 0, "")
          var keys: In = null; var vals: In = null
          var roles: In = null; var memids: In = null; var types: In = null
          fields(rIn) {
            case (1, _) => id = rIn.u()
            case (2, _) => keys = packed(lenDelim(rIn))
            case (3, _) => vals = packed(lenDelim(rIn))
            case (4, _) => meta = info(lenDelim(rIn))
            case (8, _) => roles = packed(lenDelim(rIn))
            case (9, _) => memids = packed(lenDelim(rIn))
            case (10, _) => types = packed(lenDelim(rIn))
            case (_, w) => skip(rIn, w)
          }
          val tags = Map.newBuilder[String, String]
          if (keys != null) while (!keys.atEnd) tags += (st(keys.u().toInt) -> st(vals.u().toInt))
          val members = Seq.newBuilder[OsmMember]
          var mid = 0L
          if (memids != null) while (!memids.atEnd) {
            val role = st(roles.u().toInt)
            mid += memids.s()
            members += OsmMember(MemberTypes(types.u().toInt), mid, role)
          }
          rels += OsmRelation(meta.copy(id = id), members.result(), tags.result())
        case (_, w) => skip(g, w)
      }
    }
    (nodes.result(), ways.result(), rels.result())
  }

  /** Driver-side full decode with the ingest tag filter. Data blobs are
    * independently decodable (own string table, own delta chains), so they
    * decode on a local thread pool — ordered merge keeps the result
    * identical to the sequential pass. (The distributed path is
    * OsmSource.pbfScan; this is the to-driver ingest used by the CLI and
    * the golden diffs.)
    */
  def decode(bytes: Array[Byte]): OsmInput = {
    val fs = frames(bytes)
    fs.foreach(f => require(f.btype == "OSMHeader" || f.btype == "OSMData",
      s"unknown PBF type: ${f.btype}"))
    def block(f: Frame): Array[Byte] =
      unwrapBlob(java.util.Arrays.copyOfRange(bytes, f.offset.toInt, f.offset.toInt + f.len))
    val bounds = fs.filter(_.btype == "OSMHeader").flatMap(f => decodeHeaderBlock(block(f))).headOption
    val parts = ParallelIngest.map(fs.filter(_.btype == "OSMData")) { f =>
      val (n, w, r) = decodePrimitiveBlock(block(f))
      var d = 0L
      def keep(m: Map[String, String]): Map[String, String] = {
        val kept = m.filterNot(t => OsmXml.Discardable(t._1))
        d += m.size - kept.size
        kept
      }
      (n.map(x => x.copy(tags = keep(x.tags))),
        w.map(x => x.copy(tags = keep(x.tags))),
        r.map(x => x.copy(tags = keep(x.tags))), d)
    }
    OsmInput(bounds, parts.flatMap(_._1), parts.flatMap(_._2), parts.flatMap(_._3),
      parts.map(_._4).sum)
  }

  // -------------------------------------------------------------------------
  // Encoder
  // -------------------------------------------------------------------------

  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def apply(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def strings: Seq[String] = idx.keys.toSeq
  }

  private def msg(o: Out, field: Int, body: Out): Out =
    o.u((field << 3) | 2).u(body.size).raw(body)
  private def msg(o: Out, field: Int, body: Array[Byte]): Out =
    o.u((field << 3) | 2).u(body.length).raw(body)
  private def vint(o: Out, field: Int, v: Long): Out =
    o.u((field << 3) | 0).u(v)
  private def strField(o: Out, field: Int, s: String): Out =
    msg(o, field, s.getBytes(StandardCharsets.UTF_8))

  private def blob(out: Out, btype: String, block: Array[Byte]): Unit = {
    val z = zlibDeflate(block)
    val b = new Out
    vint(b, 2, block.length)
    msg(b, 3, z)
    val bh = new Out
    strField(bh, 1, btype)
    vint(bh, 3, b.size)
    out.int32(bh.size).raw(bh).raw(b)
  }

  /** Encode to PBF: one OSMHeader blob, then nodes / ways / relations in
    * OSMData blobs of at most `perBlock` elements each.
    */
  def write(input: OsmInput, perBlock: Int = 8000): Array[Byte] = {
    val out = new Out

    val hb = new Out
    input.bounds.foreach { b =>
      val bb = new Out
      bb.u((1 << 3) | 0).s(b.minLon * 100L)
      bb.u((2 << 3) | 0).s(b.maxLon * 100L)
      bb.u((3 << 3) | 0).s(b.maxLat * 100L)
      bb.u((4 << 3) | 0).s(b.minLat * 100L)
      msg(hb, 1, bb)
    }
    strField(hb, 4, "OsmSchema-V0.6")
    strField(hb, 4, "DenseNodes")
    blob(out, "OSMHeader", hb.result())

    def primitiveBlock(group: Out, st: StringTable): Array[Byte] = {
      val stOut = new Out
      st.strings.foreach(s => strField(stOut, 1, s))
      val pb = new Out
      msg(pb, 1, stOut)
      msg(pb, 2, group)
      pb.result()
    }

    def infoMsg(st: StringTable, m: Meta): Out = {
      val i = new Out
      vint(i, 1, m.version)
      vint(i, 2, m.timestamp)
      vint(i, 3, m.changeset)
      vint(i, 4, m.uid)
      vint(i, 5, st(m.user))
      i
    }

    input.nodes.grouped(perBlock).foreach { batch =>
      val st = new StringTable
      val ids = new Out; val lats = new Out; val lons = new Out; val kvs = new Out
      val versions = new Out; val tss = new Out; val css = new Out
      val uids = new Out; val users = new Out
      var id = 0L; var lat = 0L; var lon = 0L
      var ts = 0L; var cs = 0L; var uid = 0L; var user = 0L
      batch.foreach { n =>
        ids.s(n.meta.id - id); id = n.meta.id
        lats.s(n.lat - lat); lat = n.lat
        lons.s(n.lon - lon); lon = n.lon
        versions.u(n.meta.version)
        tss.s(n.meta.timestamp - ts); ts = n.meta.timestamp
        css.s(n.meta.changeset - cs); cs = n.meta.changeset
        uids.s(n.meta.uid - uid); uid = n.meta.uid
        users.s(st(n.meta.user) - user); user = st(n.meta.user)
        n.tags.toSeq.sortBy(_._1).foreach { case (k, v) => kvs.u(st(k)); kvs.u(st(v)) }
        kvs.u(0)
      }
      val di = new Out
      msg(di, 1, versions); msg(di, 2, tss); msg(di, 3, css)
      msg(di, 4, uids); msg(di, 5, users)
      val dn = new Out
      msg(dn, 1, ids); msg(dn, 5, di)
      msg(dn, 8, lats); msg(dn, 9, lons); msg(dn, 10, kvs)
      val group = new Out
      msg(group, 2, dn)
      blob(out, "OSMData", primitiveBlock(group, st))
    }

    input.ways.grouped(perBlock).foreach { batch =>
      val st = new StringTable
      val group = new Out
      batch.foreach { w =>
        val wm = new Out
        vint(wm, 1, w.meta.id)
        val keys = new Out; val vals = new Out
        w.tags.toSeq.sortBy(_._1).foreach { case (k, v) => keys.u(st(k)); vals.u(st(v)) }
        msg(wm, 2, keys); msg(wm, 3, vals)
        msg(wm, 4, infoMsg(st, w.meta))
        val refs = new Out
        var ref = 0L
        w.nds.foreach { r => refs.s(r - ref); ref = r }
        msg(wm, 8, refs)
        msg(group, 3, wm)
      }
      blob(out, "OSMData", primitiveBlock(group, st))
    }

    input.rels.grouped(perBlock).foreach { batch =>
      val st = new StringTable
      val group = new Out
      batch.foreach { r =>
        val rm = new Out
        vint(rm, 1, r.meta.id)
        val keys = new Out; val vals = new Out
        r.tags.toSeq.sortBy(_._1).foreach { case (k, v) => keys.u(st(k)); vals.u(st(v)) }
        msg(rm, 2, keys); msg(rm, 3, vals)
        msg(rm, 4, infoMsg(st, r.meta))
        val roles = new Out; val memids = new Out; val types = new Out
        var mid = 0L
        r.members.foreach { m =>
          roles.u(st(m.role))
          memids.s(m.ref - mid); mid = m.ref
          types.u(MemberTypes.indexOf(m.mtype))
        }
        msg(rm, 8, roles); msg(rm, 9, memids); msg(rm, 10, types)
        msg(group, 4, rm)
      }
      blob(out, "OSMData", primitiveBlock(group, st))
    }

    out.result()
  }
}
