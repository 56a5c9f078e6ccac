package graft.oma

import java.nio.charset.StandardCharsets
import graft.core.Bbox
import graft.oma.Varint.{In, Out, uLen}

/** O5M reader + writer (reference O5MReader.java:48-249 semantics).
  *
  * The format is a byte stream of datasets — 1-byte id, then (for ids
  * < 0xf0) a length-prefixed body: 0x10 node, 0x11 way, 0x12 relation,
  * 0xdb bounding box, 0xff reset, 0xe0 header. Ids, timestamps, changesets,
  * coordinates and reference ids are delta-coded ACROSS elements, and
  * string pairs (tags, uid/user, member type+role) flow through a 15,000
  * entry most-recently-used reference table (O5MReader.java:33-34,
  * 210-249) — both make the format inherently sequential, so decoding runs
  * as one executor task (the reference is equally single-threaded here);
  * distribution happens downstream of the scan.
  *
  * The writer emits the same dialect the reference reads (and is diffed
  * against `oma.jar` on generated fixtures in BinaryGoldenSpec): pairs are
  * emitted as back-references whenever the identical pair sits within the
  * last 15,000 table insertions, mirroring the reader's eviction rule
  * (pairs with combined length > 250 bytes never enter the table).
  */
object O5m {

  /** File magic: reset byte + header dataset 0xe0 len 4 "o5m2"
    * (Tools.java:21, O5M_SIGNATUR). */
  val Signature: Array[Byte] =
    Array(0xff, 0xe0, 0x04, 'o'.toInt, '5'.toInt, 'm'.toInt, '2'.toInt).map(_.toByte)

  val TableSize = 15000
  private val MemberTypes = Array("node", "way", "relation")

  def isO5m(bytes: Array[Byte]): Boolean =
    bytes.length >= 7 && Signature.indices.forall(i => bytes(i) == Signature(i))

  // -------------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------------

  def decode(bytes: Array[Byte]): OsmInput = decodeChain(Iterator.single(bytes))

  /** Stateful chain decode: `chunks` are consecutive record-aligned byte
    * ranges of ONE stream; delta counters and the string table carry across
    * chunk boundaries exactly as if the bytes were decoded from a single
    * array (a 0xff reset inside any chunk still clears them). The o5m
    * auto-split path (OsmSource.o5mScan) feeds oversized reset segments —
    * beyond the JVM 2 GiB array cap — through this one sub-range at a time.
    */
  def decodeChain(chunks: Iterator[Array[Byte]]): OsmInput = {
    var id = 0L; var timestamp = 0L; var changeset = 0L
    var lon = 0L; var lat = 0L
    val refid = Array.fill(3)(0L)
    val table = new Array[(String, String)](TableSize)
    var tabIndex = 0
    var lastSize = 0

    var discarded = 0L
    def keepTags(m: Map[String, String]): Map[String, String] = {
      val kept = m.filterNot(t => OsmXml.Discardable(t._1))
      discarded += m.size - kept.size
      kept
    }

    def str(in: In): String = {
      val start = in.pos
      while (in.byte() != 0) {}
      lastSize = in.pos - 1 - start
      new String(in.buf, start, lastSize, StandardCharsets.UTF_8)
    }

    /** O5MReader.getPair: inline pair or back-reference into the table. */
    def pair(in: In, integer: Boolean, nozero: Boolean): (String, String) = {
      val idx0 = in.byte()
      if (idx0 != 0) {
        val index = if (idx0 >= 0x80) idx0 - 0x80 + (in.byte() << 7) else idx0
        return table((tabIndex + TableSize - index) % TableSize)
      }
      var len0 = 1
      val first =
        if (integer) {
          if (nozero) in.byte().toChar.toString
          else {
            val v = in.u()
            len0 = uLen(v)
            if (v != 0) in.byte() // zero separating uid and user name
            v.toString
          }
        } else { val s0 = str(in); len0 = lastSize; s0 }
      val second = str(in)
      val p = (first, second)
      if (len0 + lastSize <= 250) {
        table(tabIndex) = p
        tabIndex = (tabIndex + 1) % TableSize
      }
      p
    }

    def tags(in: In): Map[String, String] = {
      val b = Map.newBuilder[String, String]
      while (!in.atEnd) b += pair(in, integer = false, nozero = false)
      b.result()
    }

    /** O5MReader.basicInfo — note version==0 / timestamp==0 RESET the
      * delta state, exactly like the reference's assignments. */
    def basicInfo(in: In): Meta = {
      id += in.s()
      val version = in.u().toInt
      if (version == 0) {
        timestamp = 0; changeset = 0
        return Meta(id, 0, 0, 0, 0, "")
      }
      timestamp += in.s()
      if (timestamp == 0) {
        changeset = 0
        return Meta(id, version, 0, 0, 0, "")
      }
      changeset += in.s()
      val (uidStr, user) = pair(in, integer = true, nozero = false)
      Meta(id, version, timestamp, changeset, uidStr.toInt, user)
    }

    val nodes = Seq.newBuilder[OsmNode]
    val ways = Seq.newBuilder[OsmWay]
    val rels = Seq.newBuilder[OsmRelation]
    var bounds: Option[Bbox] = None

    for (bytes <- chunks) {
    val in = new In(bytes)
    while (!in.atEnd) {
      val eid = in.byte()
      val body = if (eid < 0xf0) in.sub(in.u().toInt) else null
      eid match {
        case 0x10 =>
          val m = basicInfo(body)
          lon += body.s(); lat += body.s()
          nodes += OsmNode(m, lon.toInt, lat.toInt, keepTags(tags(body)))
        case 0x11 =>
          val m = basicInfo(body)
          val refs = body.sub(body.u().toInt)
          val nds = Seq.newBuilder[Long]
          while (!refs.atEnd) { refid(0) += refs.s(); nds += refid(0) }
          ways += OsmWay(m, nds.result(), keepTags(tags(body)))
        case 0x12 =>
          val m = basicInfo(body)
          val ms = body.sub(body.u().toInt)
          val members = Seq.newBuilder[OsmMember]
          while (!ms.atEnd) {
            val delta = ms.s()
            val (tStr, role) = pair(ms, integer = true, nozero = true)
            val t = tStr.charAt(0) - '0'
            refid(t) += delta
            members += OsmMember(MemberTypes(t), refid(t), role)
          }
          rels += OsmRelation(m, members.result(), keepTags(tags(body)))
        case 0xdb =>
          bounds = Some(Bbox(body.s().toInt, body.s().toInt, body.s().toInt, body.s().toInt))
        case 0xff =>
          id = 0; timestamp = 0; changeset = 0; lon = 0; lat = 0
          refid(0) = 0; refid(1) = 0; refid(2) = 0
        case _ => // header (0xe0), sync, end-of-file — ignored like the reference
      }
    }
    }
    OsmInput(bounds, nodes.result(), ways.result(), rels.result(), discarded)
  }

  /** Segment skim for parallel decode: a single IO-only pass that hops
    * record to record (1-byte id + varint length for ids < 0xf0 — no
    * payload decode, no string table, no delta state) and records the
    * positions of 0xff reset datasets. Every segment starting at a reset
    * is independently decodable, because a spec-compliant writer clears
    * its delta counters AND its string table at each reset — pair
    * back-references never cross one (our writer enforces this; the
    * reference reader's reset, O5MReader.java:91-100, clears the deltas
    * and simply never sees a cross-reset reference from a compliant file).
    * Returns [from, until) byte ranges; a file with no mid-file resets
    * yields one segment (the sequential case).
    */
  def segments(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val cuts = Seq.newBuilder[Int]
    val in = new In(bytes)
    while (!in.atEnd) {
      val at = in.pos
      val eid = in.byte()
      if (eid == 0xff) { if (at > 0) cuts += at }
      else if (eid < 0xf0) {
        // validated skip: a malformed length must fail loudly, not rewind
        // the cursor into an infinite loop (len is Long — no Int truncation)
        val len = in.u()
        require(len >= 0 && in.pos + len <= in.end,
          s"malformed o5m record at $at: body length $len exceeds input (${in.pos} + $len > ${in.end})")
        in.pos += len.toInt
      }
      // 0xfe end-of-file and other bare datasets: no body
    }
    val bounds = (0 +: cuts.result()) :+ bytes.length
    bounds.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq.filter(s => s._2 > s._1)
  }

  /** Streaming segment skim over an InputStream with Long offsets — the
    * planet-scale driver path (OsmSource.o5mScan): the driver never holds
    * more than one record HEADER in memory (1 id byte + a varint length;
    * bodies are skipped), so driver memory is O(1) and files are not capped
    * at the 2 GiB JVM array limit the byte[] overload implies. Mirrors the
    * reference reader's own frame loop shape (O5MReader.java:60-88: read
    * type, read length, consume body) without decoding bodies.
    */
  def segmentsStream(in: java.io.InputStream, total: Long): Seq[(Long, Long)] =
    segmentChainsStream(in, total, Long.MaxValue).map(c => (c.head._1, c.last._2))

  /** Chain-aware streaming skim: like [[segmentsStream]], but a reset
    * segment larger than `maxChunk` is additionally split at RECORD
    * boundaries into sub-ranges of at most maxChunk bytes (one record can
    * exceed it only if the record itself does). Outer Seq = independently
    * decodable chains (reset-delimited); inner Seq = the sequential
    * sub-ranges of one chain — decode state crosses them, so a chain is
    * decoded by ONE task via [[decodeChain]]. This removes the former hard
    * stop on low-reset-density files whose segments exceed the JVM 2 GiB
    * array cap: such a segment now decodes as a sequential sub-task chain
    * with bounded per-read memory.
    */
  def segmentChainsStream(in: java.io.InputStream, total: Long,
                          maxChunk: Long): Seq[Seq[(Long, Long)]] = {
    val chains = Seq.newBuilder[Seq[(Long, Long)]]
    val chain = Seq.newBuilder[(Long, Long)]
    var subStart = 0L
    var pos = 0L
    def cutSub(at: Long): Unit =
      if (at > subStart) { chain += ((subStart, at)); subStart = at }
    def endChain(at: Long): Unit = {
      cutSub(at)
      val c = chain.result()
      if (c.nonEmpty) chains += c
      chain.clear()
      subStart = at
    }
    def byte(): Int = {
      val b = in.read()
      require(b >= 0, s"unexpected EOF at $pos of $total")
      pos += 1
      b
    }
    def u(): Long = {
      var value = 0L; var fak = 1L; var cont = true
      while (cont) {
        val next = byte()
        value += (next & 0x7f) * fak
        cont = next >= 0x80
        fak *= 0x80
      }
      value
    }
    while (pos < total) {
      val at = pos
      val eid = byte()
      if (eid == 0xff) { if (at > 0) endChain(at) }
      else if (eid < 0xf0) {
        val len = u()
        require(len >= 0 && pos + len <= total,
          s"malformed o5m record at $at: body length $len exceeds file ($pos + $len > $total)")
        // cut BEFORE a record that would push the sub-range past maxChunk,
        // so sub-ranges stay record-aligned and <= maxChunk
        if (pos + len - subStart > maxChunk && at > subStart) {
          chain += ((subStart, at)); subStart = at
        }
        graft.sources.RangeStore.skipFully(in, len)
        pos += len
      }
    }
    endChain(total)
    chains.result()
  }

  /** Merge per-segment decodes (segment order) back into one input. */
  def merge(parts: Seq[OsmInput]): OsmInput =
    OsmInput(
      parts.flatMap(_.bounds).headOption,
      parts.flatMap(_.nodes),
      parts.flatMap(_.ways),
      parts.flatMap(_.rels),
      parts.map(_.discardedTags).sum)

  // -------------------------------------------------------------------------
  // Encoder (fixture generation; golden-diffed against oma.jar's decoder)
  // -------------------------------------------------------------------------

  /** `resetEvery > 0` emits a 0xff reset dataset (and clears ALL writer
    * state: deltas + the pair table) every that-many elements — the
    * spec-compliant chunking real tools (osmconvert) produce, and what
    * makes [[segments]]-parallel decoding possible. 0 = single segment.
    */
  def write(input: OsmInput, resetEvery: Int = 0): Array[Byte] = {
    var lastId = 0L; var lastTs = 0L; var lastCs = 0L
    var lastLon = 0L; var lastLat = 0L
    val refid = Array.fill(3)(0L)
    // pair -> logical insertion counter; valid back-reference iff the
    // distance is within the 15,000-slot circular table
    val tablePos = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var counter = 0L

    def writePair(o: Out, p: (String, String), integer: Boolean, nozero: Boolean): Unit = {
      tablePos.get(p) match {
        case Some(at) if counter - at >= 1 && counter - at <= TableSize =>
          val d = (counter - at).toInt
          if (d < 0x80) o.byte(d)
          else { o.byte(0x80 | (d & 0x7f)); o.byte(d >> 7) }
        case _ =>
          o.byte(0)
          var len0 = 1
          if (integer) {
            if (nozero) o.byte(p._1.charAt(0).toInt)
            else {
              val v = p._1.toLong
              o.u(v); len0 = uLen(v)
              if (v != 0) o.byte(0)
            }
          } else {
            val kb = p._1.getBytes(StandardCharsets.UTF_8)
            o.raw(kb).byte(0); len0 = kb.length
          }
          val vb = p._2.getBytes(StandardCharsets.UTF_8)
          o.raw(vb).byte(0)
          if (len0 + vb.length <= 250) { tablePos(p) = counter; counter += 1 }
      }
    }

    def writeTags(o: Out, tags: Map[String, String]): Unit =
      tags.toSeq.sortBy(_._1).foreach(t => writePair(o, t, integer = false, nozero = false))

    def basicInfo(o: Out, m: Meta): Unit = {
      o.s(m.id - lastId); lastId = m.id
      o.u(m.version)
      if (m.version == 0) { lastTs = 0; lastCs = 0; return }
      o.s(m.timestamp - lastTs); lastTs = m.timestamp
      if (m.timestamp == 0) { lastCs = 0; return }
      o.s(m.changeset - lastCs); lastCs = m.changeset
      writePair(o, (m.uid.toString, m.user), integer = true, nozero = false)
    }

    val out = new Out
    var sinceReset = 0
    def maybeReset(): Unit = {
      if (resetEvery > 0 && sinceReset >= resetEvery) {
        out.byte(0xff)
        lastId = 0; lastTs = 0; lastCs = 0; lastLon = 0; lastLat = 0
        refid(0) = 0; refid(1) = 0; refid(2) = 0
        tablePos.clear(); counter = 0
        sinceReset = 0
      }
      sinceReset += 1
    }

    out.raw(Signature)
    input.bounds.foreach { b =>
      val body = new Out
      body.s(b.minLon).s(b.minLat).s(b.maxLon).s(b.maxLat)
      out.byte(0xdb).u(body.size).raw(body)
    }
    input.nodes.foreach { n =>
      maybeReset()
      val body = new Out
      basicInfo(body, n.meta)
      body.s(n.lon - lastLon); lastLon = n.lon
      body.s(n.lat - lastLat); lastLat = n.lat
      writeTags(body, n.tags)
      out.byte(0x10).u(body.size).raw(body)
    }
    input.ways.foreach { w =>
      maybeReset()
      val body = new Out
      basicInfo(body, w.meta)
      val refs = new Out
      w.nds.foreach { r => refs.s(r - refid(0)); refid(0) = r }
      body.u(refs.size).raw(refs)
      writeTags(body, w.tags)
      out.byte(0x11).u(body.size).raw(body)
    }
    input.rels.foreach { r =>
      maybeReset()
      val body = new Out
      basicInfo(body, r.meta)
      val ms = new Out
      r.members.foreach { m =>
        val t = MemberTypes.indexOf(m.mtype)
        require(t >= 0, s"unknown member type ${m.mtype}")
        ms.s(m.ref - refid(t)); refid(t) = m.ref
        writePair(ms, (('0' + t).toChar.toString, m.role), integer = true, nozero = true)
      }
      body.u(ms.size).raw(ms)
      writeTags(body, r.tags)
      out.byte(0x12).u(body.size).raw(body)
    }
    out.byte(0xfe) // end-of-file dataset (no body; ignored by the reference)
    out.result()
  }
}
