package graft.oma

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}
import scala.collection.mutable.ArrayBuffer
import graft.core.Bbox

/** The OMA wire format, re-implemented from the reference's stream classes
  * (OmaOutputStream.java:55-106, OmaInputStream.java:53-91) and file layout
  * (ChunkGenerator.java:196-215 header; TypeAnalysis.java:288-377 headers,
  * 528-694 blocks/slices, 696-712 chunk table):
  *
  *   smallInt: 1/3/7-byte escalating varint (255 / 65535 escapes)
  *   string:   UTF-8, smallInt length prefix
  *   delta:    int16 delta vs previous x (resp. y); escape -32768 + raw int32;
  *             state resets per slice
  *   slices:   optionally DEFLATE(BEST_COMPRESSION)-compressed
  */
object OmaWire {
  val FeatId = 1; val FeatVersion = 2; val FeatTimestamp = 4
  val FeatChangeset = 8; val FeatUser = 16; val FeatOneElement = 32
}

/** Growable big-endian buffer with position patching (stands in for the
  * reference's position-tracked temp streams; final files here are built in
  * memory — at scale the lineage layer streams per-tile parts instead).
  */
final class OmaBuf {
  private var buf = new Array[Byte](1 << 16)
  private var len = 0
  private def ensure(n: Int): Unit =
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  def size: Int = len
  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
  def writeShort(v: Int): Unit = { ensure(2); buf(len) = (v >> 8).toByte; buf(len + 1) = v.toByte; len += 2 }
  def writeInt(v: Int): Unit = { ensure(4); var i = 0; while (i < 4) { buf(len + i) = (v >> (24 - 8 * i)).toByte; i += 1 }; len += 4 }
  def writeLong(v: Long): Unit = { writeInt((v >> 32).toInt); writeInt(v.toInt) }
  def write(bytes: Array[Byte]): Unit = { ensure(bytes.length); System.arraycopy(bytes, 0, buf, len, bytes.length); len += bytes.length }
  def patchInt(pos: Int, v: Int): Unit = { var i = 0; while (i < 4) { buf(pos + i) = (v >> (24 - 8 * i)).toByte; i += 1 } }
  def patchLong(pos: Int, v: Long): Unit = { patchInt(pos, (v >> 32).toInt); patchInt(pos + 4, v.toInt) }
  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)

  def writeSmallInt(value: Int): Unit =
    if (value < 255) writeByte(value)
    else { writeByte(255); if (value < 65535) writeShort(value) else { writeShort(65535); writeInt(value) } }
  def writeString(s: String): Unit = { val b = s.getBytes("UTF-8"); writeSmallInt(b.length); write(b) }
}

/** Delta-codec state (one x and one y register, reset per slice). */
final class DeltaState {
  var lastX = 0; var lastY = 0
  def reset(): Unit = { lastX = 0; lastY = 0 }
  def writeX(out: OmaBuf, v: Int): Unit = { lastX = delta(out, lastX, v) }
  def writeY(out: OmaBuf, v: Int): Unit = { lastY = delta(out, lastY, v) }
  private def delta(out: OmaBuf, last: Int, v: Int): Int = {
    val d = v.toLong - last
    if (d >= -32767 && d <= 32767) out.writeShort(d.toInt & 0xffff)
    else { out.writeShort(-32768 & 0xffff); out.writeInt(v) }
    v
  }
}

// ---------------------------------------------------------------------------
// Parsed representation of a complete .oma file (for golden diffs)
// ---------------------------------------------------------------------------

final case class ParsedEl(kind: Char, lon: Seq[Int], lat: Seq[Int],
                          holesLon: Seq[Seq[Int]], holesLat: Seq[Seq[Int]],
                          tags: Map[String, String], members: Seq[BackLink], meta: Meta)
final case class OmaSlice(value: String, elements: Seq[ParsedEl])
final case class OmaBlock(key: String, slices: Seq[OmaSlice])
final case class OmaChunk(ctype: Char, bounds: Bbox, blocks: Seq[OmaBlock])
final case class TypeCatalog(entries: Map[Char, Seq[(String, Seq[String])]])
final case class OmaFile(features: Int, bbox: Bbox, compression: String,
                         catalog: TypeCatalog, chunks: Seq[OmaChunk])

object OmaReader {

  final class In(bytes: Array[Byte]) {
    var pos = 0
    def readByte(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def readShort(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v.toShort.toInt }
    def readInt(): Int = { var v = 0; var i = 0; while (i < 4) { v = (v << 8) | (bytes(pos + i) & 0xff); i += 1 }; pos += 4; v }
    def readLong(): Long = { val hi = readInt().toLong; val lo = readInt().toLong & 0xffffffffL; (hi << 32) | lo }
    def readSmallInt(): Int = {
      val v = readByte()
      if (v < 255) v
      else { val s = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; if (s < 65535) s else readInt() }
    }
    def readString(): String = {
      val n = readSmallInt(); val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
    }
    def readBytes(n: Int): Array[Byte] = { val b = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; b }
    var lastX = 0; var lastY = 0
    def resetDelta(): Unit = { lastX = 0; lastY = 0 }
    def readDeltaX(): Int = { lastX = readDelta(lastX); lastX }
    def readDeltaY(): Int = { lastY = readDelta(lastY); lastY }
    private def readDelta(last: Int): Int = { val d = readShort(); if (d == -32768) readInt() else last + d }
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val in = new InflaterInputStream(new ByteArrayInputStream(data))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  def read(bytes: Array[Byte]): OmaFile = {
    val in = new In(bytes)
    require(in.readByte() == 'O' && in.readByte() == 'M' && in.readByte() == 'A', "bad magic")
    in.readByte() // version
    val features = in.readByte()
    val bbox = Bbox(in.readInt(), in.readInt(), in.readInt(), in.readInt())
    val chunkTablePos = in.readLong()

    // optional headers until the 0 terminator
    var compression = "NONE"
    var catalog = TypeCatalog(Map.empty)
    var done = false
    while (!done) {
      val h = in.readByte()
      val zipped = (h & 128) != 0
      (h & 127).toChar match {
        case 'c' => in.readInt(); compression = in.readString()
        case 't' =>
          val end = in.readInt()
          val payload = if (zipped) {
            val zlen = in.readInt()
            inflate(in.readBytes(zlen))
          } else in.readBytes(end - in.pos)
          catalog = readCatalog(new In(payload))
          in.pos = end
        case 0 => done = true
        case other => throw new IllegalStateException(s"unknown header '$other'")
      }
      if (h == 0) done = true
    }

    // chunk table
    in.pos = chunkTablePos.toInt
    val chunkCount = in.readInt()
    val chunkRefs = (0 until chunkCount).map { _ =>
      (in.readLong(), in.readByte().toChar, Bbox(in.readInt(), in.readInt(), in.readInt(), in.readInt()))
    }

    val zip = compression == "DEFLATE"
    // chunk bodies are position-independent (chunk-relative offsets) — the
    // property the distributed sink AND the pruned scan (OmaScan) rely on
    val starts = chunkRefs.map(_._1).sorted
    val chunks = chunkRefs.map { case (start, ctype, cb) =>
      val end = starts.find(_ > start).getOrElse(chunkTablePos)
      val body = java.util.Arrays.copyOfRange(bytes, start.toInt, end.toInt)
      OmaChunk(ctype, cb, readChunkBody(body, ctype, features, zip))
    }
    OmaFile(features, bbox, compression, catalog, chunks)
  }

  /** Decode one chunk body (bytes from its start to the next chunk's) —
    * all internal offsets are chunk-relative, so this needs no file
    * context and can run on any executor. */
  def readChunkBody(chunk: Array[Byte], ctype: Char, features: Int, zip: Boolean): Seq[OmaBlock] = {
    val in = new In(chunk)
    val blockTableOff = in.readInt()
    val bin = new In(chunk); bin.pos = blockTableOff
    val nBlocks = bin.readSmallInt()
    (0 until nBlocks).map { _ =>
      val off = bin.readInt(); val key = bin.readString()
      readBlock(chunk, off, key, ctype, features, zip)
    }
  }

  private def readCatalog(in: In): TypeCatalog = {
    val nTypes = in.readSmallInt()
    val entries = (0 until nTypes).map { _ =>
      val t = in.readByte().toChar
      val nKeys = in.readSmallInt()
      t -> (0 until nKeys).map { _ =>
        val key = in.readString()
        val nVals = in.readSmallInt()
        key -> (0 until nVals).map(_ => in.readString())
      }
    }.toMap
    TypeCatalog(entries)
  }

  private def readBlock(bytes: Array[Byte], start: Int, key: String,
                        ctype: Char, features: Int, zip: Boolean): OmaBlock = {
    val in = new In(bytes); in.pos = start
    val sliceTableOff = in.readInt()
    val tin = new In(bytes); tin.pos = start + sliceTableOff
    val nSlices = tin.readSmallInt()
    val slices = (0 until nSlices).map { _ =>
      val off = tin.readInt(); val value = tin.readString()
      readSlice(bytes, start + off, value, ctype, features, zip)
    }
    OmaBlock(key, slices)
  }

  private def readSlice(bytes: Array[Byte], start: Int, value: String,
                        ctype: Char, features: Int, zip: Boolean): OmaSlice = {
    val in = new In(bytes); in.pos = start
    val count = in.readInt()
    val payload =
      if (zip) { val clen = in.readInt(); inflate(in.readBytes(clen)) }
      else java.util.Arrays.copyOfRange(bytes, in.pos, bytes.length)
    val pin = new In(payload)
    pin.resetDelta()
    val els = (0 until count).map(_ => readElement(pin, ctype, features))
    OmaSlice(value, els)
  }

  private def readElement(in: In, ctype: Char, features: Int): ParsedEl = {
    import OmaWire._
    var lon: Seq[Int] = Nil; var lat: Seq[Int] = Nil
    var hLon: Seq[Seq[Int]] = Nil; var hLat: Seq[Seq[Int]] = Nil
    ctype match {
      case 'N' =>
        lon = Seq(in.readDeltaX()); lat = Seq(in.readDeltaY())
      case 'W' =>
        val n = in.readSmallInt()
        val (xs, ys) = (new ArrayBuffer[Int](n), new ArrayBuffer[Int](n))
        (0 until n).foreach { _ => xs += in.readDeltaX(); ys += in.readDeltaY() }
        lon = xs.toSeq; lat = ys.toSeq
      case 'A' =>
        val n = in.readSmallInt()
        val (xs, ys) = (new ArrayBuffer[Int](n), new ArrayBuffer[Int](n))
        (0 until n).foreach { _ => xs += in.readDeltaX(); ys += in.readDeltaY() }
        lon = xs.toSeq; lat = ys.toSeq
        val nh = in.readSmallInt()
        val (hxs, hys) = (new ArrayBuffer[Seq[Int]](nh), new ArrayBuffer[Seq[Int]](nh))
        (0 until nh).foreach { _ =>
          val m = in.readSmallInt()
          val (hx, hy) = (new ArrayBuffer[Int](m), new ArrayBuffer[Int](m))
          (0 until m).foreach { _ => hx += in.readDeltaX(); hy += in.readDeltaY() }
          hxs += hx.toSeq; hys += hy.toSeq
        }
        hLon = hxs.toSeq; hLat = hys.toSeq
      case 'C' =>
        in.readSmallInt() // always 0
    }
    val nTags = in.readSmallInt()
    val tags = (0 until nTags).map(_ => in.readString() -> in.readString()).toMap
    val nMem = in.readSmallInt()
    val members = (0 until nMem).map(_ => BackLink(in.readLong(), in.readString(), in.readSmallInt()))
    val f = if (ctype == 'C') features | FeatId else features
    val id = if ((f & FeatId) != 0) in.readLong() else 0L
    val version = if ((f & FeatVersion) != 0) in.readSmallInt() else 0
    val ts = if ((f & FeatTimestamp) != 0) in.readLong() else 0L
    val cs = if ((f & FeatChangeset) != 0) in.readLong() else 0L
    val (uid, user) =
      if ((f & FeatUser) != 0) (in.readInt(), in.readString()) else (0, null)
    ParsedEl(ctype, lon, lat, hLon, hLat, tags, members, Meta(id, version, ts, cs, uid, user))
  }
}

// ---------------------------------------------------------------------------
// Writer: serializes the engine's classified/grouped output into a .oma file
// ---------------------------------------------------------------------------

object OmaWriter {
  import OmaWire._

  def deflate(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DeflaterOutputStream(bos, new Deflater(Deflater.BEST_COMPRESSION))
    dos.write(data); dos.finish()
    bos.toByteArray
  }

  /** Serialize one element to slice-payload wire form. */
  def writeElement(out: OmaBuf, ds: DeltaState, kind: Char, features: Int,
                   lon: Array[Int], lat: Array[Int],
                   hLon: Array[Array[Int]], hLat: Array[Array[Int]],
                   tags: Seq[(String, String)], members: Seq[BackLink], meta: Meta): Unit = {
    kind match {
      case 'N' =>
        ds.writeX(out, lon(0)); ds.writeY(out, lat(0))
      case 'W' =>
        out.writeSmallInt(lon.length)
        var i = 0
        while (i < lon.length) { ds.writeX(out, lon(i)); ds.writeY(out, lat(i)); i += 1 }
      case 'A' =>
        out.writeSmallInt(lon.length)
        var i = 0
        while (i < lon.length) { ds.writeX(out, lon(i)); ds.writeY(out, lat(i)); i += 1 }
        out.writeSmallInt(hLon.length)
        var k = 0
        while (k < hLon.length) {
          out.writeSmallInt(hLon(k).length)
          var j = 0
          while (j < hLon(k).length) { ds.writeX(out, hLon(k)(j)); ds.writeY(out, hLat(k)(j)); j += 1 }
          k += 1
        }
      case 'C' =>
        out.writeSmallInt(0)
    }
    out.writeSmallInt(tags.length)
    tags.foreach { case (k, v) => out.writeString(k); out.writeString(v) }
    out.writeSmallInt(members.length)
    members.foreach { m => out.writeLong(m.relId); out.writeString(m.role); out.writeSmallInt(m.nr) }
    val f = if (kind == 'C') features | FeatId else features
    if ((f & FeatId) != 0) out.writeLong(meta.id)
    if ((f & FeatVersion) != 0) out.writeSmallInt(meta.version)
    if ((f & FeatTimestamp) != 0) out.writeLong(meta.timestamp)
    if ((f & FeatChangeset) != 0) out.writeLong(meta.changeset)
    if ((f & FeatUser) != 0) { out.writeInt(meta.uid); out.writeString(if (meta.user == null) "" else meta.user) }
  }

  /** Serialize ONE chunk's body — block table, slice tables, payloads — to
    * position-independent bytes: every offset inside a chunk is chunk- or
    * block-RELATIVE (TypeAnalysis.java:528-694 semantics), and the delta
    * state resets per slice, so chunk bodies can be produced on EXECUTORS
    * in parallel and the driver only concatenates them and patches the
    * chunk table (the distributed sink shape; see OmaPipeline).
    */
  def writeChunkBody(blocks: Seq[(String, Seq[(String, Seq[(OmaBuf, DeltaState) => Unit])])],
                     zip: Boolean): Array[Byte] = {
    val out = new OmaBuf
    val blockTableJump = out.size
    out.writeInt(0)
    val blockOffsets = blocks.map { case (key, slices) =>
      val blockStart = out.size
      val sliceTableJump = out.size
      out.writeInt(0)
      val sliceOffsets = slices.map { case (value, els) =>
        val sliceStart = out.size
        out.writeInt(els.length)
        val payload = new OmaBuf
        val ds = new DeltaState
        els.foreach(f => f(payload, ds))
        if (zip) {
          val z = deflate(payload.toBytes)
          out.writeInt(z.length)
          out.write(z)
        } else out.write(payload.toBytes)
        (sliceStart - blockStart, value)
      }
      out.patchInt(sliceTableJump, out.size - blockStart)
      out.writeSmallInt(sliceOffsets.length)
      sliceOffsets.foreach { case (off, v) => out.writeInt(off); out.writeString(v) }
      (blockStart, key)
    }
    out.patchInt(blockTableJump, out.size)
    out.writeSmallInt(blockOffsets.length)
    blockOffsets.foreach { case (off, k) => out.writeInt(off); out.writeString(k) }
    out.toBytes
  }

  /** Assemble a full .oma file from per-chunk pre-serialized bodies: write
    * the header, concatenate the bodies (recording each chunk's start
    * offset), then write the chunk table — the only driver-side work in the
    * distributed sink.
    */
  /** Fixed header + optional headers, as standalone bytes, plus the file
    * position of the chunk-table pointer to patch later (the streamed
    * sink's building block). */
  def headerBytes(features: Int, bbox: Bbox, zip: Boolean,
                  catalog: Seq[(Char, Seq[(String, Seq[String])])]): (Array[Byte], Long) = {
    val out = new OmaBuf
    out.writeByte('O'); out.writeByte('M'); out.writeByte('A'); out.writeByte(1)
    out.writeByte(features)
    out.writeInt(bbox.minLon); out.writeInt(bbox.minLat); out.writeInt(bbox.maxLon); out.writeInt(bbox.maxLat)
    val chunkTablePtrPos = out.size
    out.writeLong(0L)

    // compression header ('c', jump-to-next, name)
    out.writeByte('c')
    val cJump = out.size
    out.writeInt(0)
    out.writeString(if (zip) "DEFLATE" else "NONE")
    out.patchInt(cJump, out.size)

    // type header ('t' | 0x80 if zipped)
    out.writeByte('t' + (if (zip) 128 else 0))
    val tJump = out.size
    out.writeInt(0)
    val zJump = out.size
    if (zip) out.writeInt(0)
    val cat = new OmaBuf
    cat.writeSmallInt(catalog.length)
    catalog.foreach { case (t, keys) =>
      cat.writeByte(t)
      cat.writeSmallInt(keys.length)
      keys.foreach { case (k, vs) =>
        cat.writeString(k); cat.writeSmallInt(vs.length); vs.foreach(cat.writeString)
      }
    }
    out.write(if (zip) deflate(cat.toBytes) else cat.toBytes)
    out.patchInt(tJump, out.size)
    if (zip) out.patchInt(zJump, out.size - zJump - 4)

    out.writeByte(0) // end of header
    (out.toBytes, chunkTablePtrPos.toLong)
  }

  def writeFileFromParts(features: Int, bbox: Bbox, zip: Boolean,
                         catalog: Seq[(Char, Seq[(String, Seq[String])])],
                         parts: Seq[(Char, Bbox, Array[Byte])]): Array[Byte] = {
    val (hdr, chunkTablePtrPos) = headerBytes(features, bbox, zip, catalog)
    val out = new OmaBuf
    out.write(hdr)

    val table = new ArrayBuffer[(Long, Char, Bbox)]
    parts.foreach { case (ctype, cb, body) =>
      table += ((out.size.toLong, ctype, cb))
      out.write(body)
    }

    // chunk table + header patch
    val tableStart = out.size
    out.writeInt(table.length)
    table.foreach { case (start, t, b) =>
      out.writeLong(start); out.writeByte(t)
      out.writeInt(b.minLon); out.writeInt(b.minLat); out.writeInt(b.maxLon); out.writeInt(b.maxLat)
    }
    out.patchLong(chunkTablePtrPos.toInt, tableStart.toLong)
    out.toBytes
  }

  /** Single-process convenience: serialize chunk bodies inline, then
    * assemble (same bytes as the distributed path by construction). */
  def writeFile(features: Int, bbox: Bbox, zip: Boolean,
                catalog: Seq[(Char, Seq[(String, Seq[String])])],
                chunks: Seq[(Char, Bbox, Seq[(String, Seq[(String, Seq[(OmaBuf, DeltaState) => Unit])])])]): Array[Byte] =
    writeFileFromParts(features, bbox, zip, catalog,
      chunks.map { case (t, b, blocks) => (t, b, writeChunkBody(blocks, zip)) })
}
