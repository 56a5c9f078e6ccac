package graft.oma

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.sources.RangeStore

/** One decoded OSM element as a flat Spark row (the scan-operator output
  * shape shared by the XML / O5M / PBF sources).
  */
final case class OsmRow(
    kind: String, // "node" | "way" | "relation"
    id: Long, version: Int, ts: Long, cs: Long, uid: Int, user: String,
    lon: Int, lat: Int,
    nds: Seq[Long],
    mtypes: Seq[String], mrefs: Seq[Long], mroles: Seq[String],
    tags: Map[String, String])

/** Format dispatch (reference OSMReader.getReader + Tools.isO5M/isPBF):
  * sniff the magic bytes and parse with the matching decoder. Also the home
  * of the Spark scan surface over the binary formats.
  */
object OsmSource {

  /** S1 format dispatch — magic-byte sniff, then full parse. The o5m
    * branch decodes reset segments on a local thread pool (ordered merge;
    * identical to the sequential pass), mirroring Pbf.decode's per-blob
    * parallelism — so the to-driver ingest of both binary formats uses
    * every core while the reference stays single-threaded.
    */
  def read(bytes: Array[Byte]): OsmInput =
    if (O5m.isO5m(bytes)) {
      val segs = O5m.segments(bytes)
      if (segs.size <= 1) O5m.decode(bytes)
      else O5m.merge(ParallelIngest.map(segs) { case (from, until) =>
        O5m.decode(java.util.Arrays.copyOfRange(bytes, from, until))
      })
    } else if (Pbf.isPbf(bytes)) Pbf.decode(bytes)
    else OsmXml.parse(new String(bytes, StandardCharsets.UTF_8))

  /** Whole-file driver-side read — serves ONLY the XML path (a single XML
    * document is inherently sequential) and in-memory golden fixtures; the
    * CLI's binary inputs go through the streaming scans (OmaCli:170-190),
    * which never materialize a file as one array. Capped at 2 GiB by the
    * JVM array limit — acceptable for the XML-document use case only.
    */
  def read(path: String): OsmInput = read(Files.readAllBytes(Paths.get(path)))

  def toRows(input: OsmInput): Seq[OsmRow] =
    input.nodes.map(n => OsmRow("node", n.meta.id, n.meta.version, n.meta.timestamp,
      n.meta.changeset, n.meta.uid, n.meta.user, n.lon, n.lat,
      Nil, Nil, Nil, Nil, n.tags)) ++
      input.ways.map(w => OsmRow("way", w.meta.id, w.meta.version, w.meta.timestamp,
        w.meta.changeset, w.meta.uid, w.meta.user, 0, 0,
        w.nds, Nil, Nil, Nil, w.tags)) ++
      input.rels.map(r => OsmRow("relation", r.meta.id, r.meta.version, r.meta.timestamp,
        r.meta.changeset, r.meta.uid, r.meta.user, 0, 0,
        Nil, r.members.map(_.mtype), r.members.map(_.ref), r.members.map(_.role), r.tags))

  /** O5M scan. The format's cross-element delta + string-table state is
    * sequential WITHIN a reset segment (O5MReader.java:33-34), but 0xff
    * reset datasets clear all of it — so the driver runs an IO-only skim
    * (`O5m.segments`: 1-byte id + varint length per record, no payload
    * decode) and executors decode the segments in parallel, each reading
    * just its own byte range. A file without mid-file resets degrades to
    * the single-task sequential decode, which is also the reference's
    * behavior.
    */
  /** Sub-range ceiling for oversized o5m reset segments: well under the JVM
    * 2 GiB array cap, large enough that chains stay short. */
  val O5mMaxChunk: Long = 512L << 20

  def o5mScan(spark: SparkSession, path: String, parts: Int = 0,
              store: RangeStore = RangeStore.local,
              maxChunk: Long = O5mMaxChunk): Dataset[OsmRow] = {
    import spark.implicits._
    // STREAMING skim per file: O(1) driver memory, Long offsets — never the
    // 2 GiB byte[] ceiling (planet.o5m is ~60 GB; the skim is why the scan
    // scales). `path` may be a directory of sharded extracts (store.list);
    // each chain row carries its own file path. A reset segment larger than
    // maxChunk arrives as a CHAIN of record-aligned sub-ranges decoded
    // sequentially by one task (decodeChain — delta/string-table state
    // crosses sub-ranges), so low-reset-density files degrade to fewer,
    // bigger sequential tasks instead of failing.
    val chains = store.list(path).flatMap { f =>
      val in = store.open(f)
      val cs = try O5m.segmentChainsStream(in, store.length(f), maxChunk) finally in.close()
      cs.map(c => (f, c.map(_._1), c.map(_._2)))
    }
    chains.foreach { case (f, froms, untils) =>
      froms.lazyZip(untils).foreach { (a, b) =>
        require(b - a <= Int.MaxValue,
          s"o5m record at $f:[$a,$b) exceeds 2 GiB — a single record cannot be split")
      }
    }
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    spark.createDataset(chains)
      .repartition(math.min(n, math.max(1, chains.size)))
      .flatMap { case (p, froms, untils) =>
        toRows(O5m.decodeChain(froms.iterator.zip(untils.iterator).map {
          case (a, b) => store.readRange(p, a, (b - a).toInt)
        }))
      }
  }

  /** PBF scan: blobs are independently decodable (own string table, own
    * delta chains), so the driver skims the frame table (metadata only,
    * bodies skipped, streaming — O(1) driver memory) and executors decode
    * blobs in parallel — the shape that scales to a 1000-executor cluster
    * reading planet-size files.
    */
  def pbfScan(spark: SparkSession, path: String, parts: Int = 0,
              store: RangeStore = RangeStore.local): Dataset[OsmRow] = {
    import spark.implicits._
    // `path` may be a directory of sharded extracts (store.list) — blobs
    // are independently decodable, so multi-file is just more frames, each
    // carrying its own file path
    val fs = store.list(path).flatMap { f =>
      val in = store.open(f)
      val frames = try Pbf.framesStream(in, store.length(f)) finally in.close()
      frames.filter(_.btype == "OSMData").map(fr => (f, fr.offset, fr.len))
    }
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    spark.createDataset(fs)
      .repartition(math.min(n, math.max(1, fs.size)))
      .flatMap { case (p, off, len) =>
        val blob = store.readRange(p, off, len)
        val (nodes, ways, rels) = Pbf.decodePrimitiveBlock(Pbf.unwrapBlob(blob))
        // same ingest-time discardable-tag filter as every other source
        toRows(OsmInput(None, nodes, ways, rels))
          .map(r => r.copy(tags = r.tags.filterNot(t => OsmXml.Discardable(t._1))))
      }
  }
}
