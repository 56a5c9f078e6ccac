package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import graft.oma._

/** Head-to-head conversion benchmark vs the reference converter — the
  * "matches-or-beats its single-node throughput at the same data scale"
  * claim, measured: generate a deterministic planet-shaped .o5m (the most
  * compact input both engines read), convert it with `oma.jar` and with our
  * Spark pipeline on the same machine, assert the chunk tables agree
  * (count, kinds, bounds, per-chunk element counts), and print one JSON
  * line with both wall-clocks.
  *
  * Scale via SPARK_GRAFT_NODES (default 500k nodes + 50k ways + 2k
  * relations). The reference is single-threaded by design; our engine uses
  * the cores it is given — that parallelism IS the comparison.
  */
object ConvertBench {

  /** Deterministic synthetic OSM input: world-spread nodes (ids ascending,
    * ~1-in-10 tagged), 5-node ways over consecutive nodes (closed every
    * 4th — the area path), and multipolygon relations over dedicated
    * square rings.
    */
  def synth(nNodes: Int, nWays: Int, nRels: Int): OsmInput = {
    def meta(id: Long) = Meta(id, (id % 9 + 1).toInt, 1577836800L + id, 1000 + id,
      (id % 101).toInt, s"user${id % 17}")
    // xorshift-ish deterministic spread (no external seed source)
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val nodes = (1 to nNodes).map { i =>
      val id = i.toLong
      val lon = (math.floorMod(mix(id * 2 + 1), 3600000001L) - 1800000000L).toInt
      val lat = (math.floorMod(mix(id * 2 + 2), 1800000001L) - 900000000L).toInt
      val tags: Map[String, String] =
        if (i % 10 == 0) Map("amenity" -> s"v${i % 5}") else Map.empty
      OsmNode(meta(id), lon, lat, tags)
    }
    val ways = (1 to nWays).map { j =>
      val id = 1000000L + j
      val base = (j.toLong * 7) % math.max(1, nNodes - 6) + 1
      val nds =
        if (j % 4 == 0) Seq(base, base + 1, base + 2, base + 3, base) // closed
        else (0 until 5).map(base + _)
      val tags = if (j % 4 == 0) Map("building" -> "yes")
        else Map("highway" -> s"h${j % 3}")
      OsmWay(meta(id), nds, tags)
    }
    val rels = (1 to nRels).map { r =>
      val id = 2000000L + r
      // each relation claims two consecutive closed ways as outer rings
      val w1 = 1000000L + ((r.toLong * 8) % math.max(4, nWays - 8) / 4) * 4 + 4
      OsmRelation(meta(id), Seq(
        OsmMember("way", w1, "outer"),
        OsmMember("node", (r % nNodes + 1).toLong, "admin_centre")),
        Map("type" -> "multipolygon", "landuse" -> "forest"))
    }
    OsmInput(None, nodes, ways, rels)
  }

  def main(args: Array[String]): Unit = {
    val nNodes = sys.env.getOrElse("SPARK_GRAFT_NODES", "500000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = Files.createTempDirectory("convbench")
    val input = synth(nNodes, nNodes / 10, nNodes / 250)
    val o5m = dir.resolve("planet.o5m")
    // reset every 4096 elements — the chunking real o5m tools emit, and
    // what lets our ingest decode segments in parallel (oma.jar reads the
    // same file; its reader accepts resets but stays single-threaded)
    Files.write(o5m, O5m.write(input, resetEvery = 4096))
    val o5mBytes = Files.size(o5m)

    val refBbs = Paths.get("/root/reference/default.bbs")
    val refType = Paths.get("/root/reference/default.type")

    // reference run (single-threaded by design). Small heap on purpose:
    // oma.jar eagerly allocates ~90% of -Xmx; 2g is ample for this input.
    val refOut = dir.resolve("ref.oma")
    val cmd = Seq("java", "-Xmx2g", "-jar", "/root/reference/oma.jar",
      "-b", refBbs.toString, "-t", refType.toString, "-p", "all",
      o5m.toString, refOut.toString)
    val t0 = System.nanoTime()
    val rc = Process(cmd).!(ProcessLogger(_ => (), _ => ()))
    val refSec = (System.nanoTime() - t0) / 1e9
    require(rc == 0, s"oma.jar failed: $cmd")

    // our run (same file, same configs): the fully DISTRIBUTED path the CLI
    // takes for binary inputs — streaming skim -> executor byte-range
    // decode -> Dataset -> reunify/tile/classify -> streamed sink. No
    // OsmInput ever materializes driver-side.
    val spark = Bench.session(cpus)
    val ourOut = dir.resolve("ours.oma")
    val t1 = System.nanoTime()
    val rows = OsmSource.o5mScan(spark, o5m.toString)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val table = OmaPipeline.runToFile(spark, rows,
      Files.readString(refBbs), Files.readString(refType),
      features = 31, zip = true, oneElement = false, ourOut.toString)
    val ourSec = (System.nanoTime() - t1) / 1e9
    rows.unpersist()

    // agreement: chunk tables (count, kind, bounds) and per-chunk element
    // counts — the element->chunk assignment summary
    val refHdr = OmaScan.header(refOut.toString)
    val ourHdr = OmaScan.header(ourOut.toString)
    def key(h: OmaScan.Header) = h.chunks.map(c => (c.ctype, c.bounds)).sortBy(_.toString)
    require(refHdr.chunks.size == ourHdr.chunks.size,
      s"chunk count ${ourHdr.chunks.size} != ref ${refHdr.chunks.size}")
    require(key(refHdr) == key(ourHdr), "chunk table (kind/bounds) mismatch")
    def counts(path: String) = OmaScan.scan(spark, path)
      .groupBy("ctype").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val refCounts = counts(refOut.toString)
    val ourCounts = counts(ourOut.toString)
    require(refCounts == ourCounts, s"element counts $ourCounts != ref $refCounts")

    val total = refCounts.values.sum
    // throughput over INPUT elements (most untagged-unreferenced nodes are
    // dropped by the P2 rule, but both engines still read and join them)
    val inputEls = input.nodes.size.toLong + input.ways.size + input.rels.size
    println(s"""{"metric":"convert_head_to_head","nodes":$nNodes,"input_elements":$inputEls,"output_elements":$total,"o5m_bytes":$o5mBytes,"ref_sec":$refSec,"ours_sec":$ourSec,"speedup":${refSec / ourSec},"cpus":$cpus,"chunks":${refHdr.chunks.size},"ref_input_els_per_sec":${(inputEls / refSec).toLong},"ours_input_els_per_sec":${(inputEls / ourSec).toLong}}""")
    spark.stop()
  }
}
