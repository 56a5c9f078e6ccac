package graft.oma

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Bbox, Bbs, Geo, TileIndex}

/** Steps 2+3 over the reunified element stream: first-match tile assignment
  * (ChunkGenerator.java:549-574 — the two-level prechunk detour is replaced
  * by Spark's shuffle; the ASSIGNMENT is identical), type classification and
  * block/slice grouping (TypeAnalysis.java:399-637), and the final .oma
  * container write. The sink is DISTRIBUTED: chunk bodies are serialized on
  * executors (repartition by chunk key + sortWithinPartitions, one byte
  * blob per chunk — offsets inside a chunk are relative, TypeAnalysis.java:
  * 639-712), and the driver only concatenates the bodies and patches the
  * chunk table. Driver memory is O(total chunk bytes), never O(elements);
  * the lineage layer (TileLineage) is the per-tile parquet variant of the
  * same layout for resumable 100 TB runs.
  */
object OmaPipeline {

  final case class ClassifiedRow(
      kindRank: Int, tile: Int, subPass: Int,
      outKind: String, blockIdx: Int, sliceOrder: Int, sliceValue: String,
      seq: Long,
      lon: Array[Int], lat: Array[Int],
      holesLon: Array[Array[Int]], holesLat: Array[Array[Int]],
      tags: Map[String, String], members: Array[BackLink], meta: Meta)

  private val Marker = 0x7f000000L

  /** step-2 sentinel collapse: any vertex with lon >= 0x7f000000 becomes
    * (MAX_VALUE, MAX_VALUE) — the check is on lon only, like the reference.
    */
  def collapse(lon: Array[Int], lat: Array[Int]): Unit = {
    var i = 0
    while (i < lon.length) {
      if (lon(i) >= Marker) { lon(i) = Int.MaxValue; lat(i) = Int.MaxValue }
      i += 1
    }
  }

  def tileOf(index: TileIndex, kind: String,
             lon: Array[Int], lat: Array[Int],
             hLon: Array[Array[Int]], hLat: Array[Array[Int]]): Int = kind match {
    case "N" => index.tileOfPoint(lon(0), lat(0))
    case "C" => index.size
    case _ =>
      if (lon.isEmpty && hLon.isEmpty) index.size
      else {
        var mnLo = Int.MaxValue; var mnLa = Int.MaxValue
        var mxLo = Int.MinValue; var mxLa = Int.MinValue
        def acc(x: Int, y: Int): Unit = {
          if (x < mnLo) mnLo = x; if (x > mxLo) mxLo = x
          if (y < mnLa) mnLa = y; if (y > mxLa) mxLa = y
        }
        var i = 0
        while (i < lon.length) { acc(lon(i), lat(i)); i += 1 }
        var k = 0
        while (k < hLon.length) {
          var j = 0
          while (j < hLon(k).length) { acc(hLon(k)(j), hLat(k)(j)); j += 1 }
          k += 1
        }
        index.tileOfRect(Bbox(mnLo, mnLa, mxLo, mxLa))
      }
  }

  /** classify one tiled element into 0..n ClassifiedRows (step 3). */
  def classifyElement(cfg: TypeConfig, oneElement: Boolean,
                      e: El, tile: Int): Seq[ClassifiedRow] = {
    def rows(outKind: Char, subPass: Int, cls: Classified,
             lon: Array[Int], lat: Array[Int],
             hLon: Array[Array[Int]], hLat: Array[Array[Int]]): Seq[ClassifiedRow] = {
      val keys = cfg.keysFor(outKind)
      val values = cfg.valuesFor(outKind)
      val kindRank = e.kind match { case "N" => 0; case "W" => 1; case "A" => 2; case "C" => 3 }
      cls.blocks.map { j =>
        val (sliceOrder, sliceValue) =
          if (j == keys.length) (0, "")
          else {
            val v = cls.finalTags.getOrElse(keys(j), null)
            val idx = values(j).indexOf(v)
            if (idx >= 0) (idx, v) else (values(j).length, "")
          }
        ClassifiedRow(kindRank, tile, subPass, outKind.toString, j, sliceOrder, sliceValue,
          e.seq, lon, lat, hLon, hLat, cls.finalTags, e.members, e.meta)
      }
    }

    e.kind match {
      case "N" =>
        rows('N', 0, Classifier.classify(cfg, 'N', split = false, closed = false, e.tags, oneElement),
          e.lon, e.lat, e.holesLon, e.holesLat)
      case "C" =>
        rows('C', 0, Classifier.classify(cfg, 'C', split = false, closed = false, e.tags, oneElement),
          e.lon, e.lat, e.holesLon, e.holesLat)
      case "A" =>
        rows('A', 0, Classifier.classify(cfg, 'A', split = false, closed = false, e.tags, oneElement),
          e.lon, e.lat, e.holesLon, e.holesLat)
      case "W" =>
        val closed = Geo.isClosed(e.lon, e.lat)
        val pass1 = Classifier.classify(cfg, 'W', split = true, closed = closed, e.tags, oneElement)
        // matched-as-area entries become Areas (last vertex dropped, no holes)
        val asArea = rows('A', 0, pass1, e.lon.dropRight(1), e.lat.dropRight(1),
          Array.empty, Array.empty)
        val leftovers =
          if (!pass1.toSplit) Seq.empty
          else {
            // re-analysis of the split stream as a W chunk (split = false);
            // the way re-enters with the tag state it had when written to
            // the split stream (earlier lifecycle rewrites already applied)
            val pass2 = Classifier.classify(cfg, 'W', split = false, closed = closed,
              pass1.splitTags, oneElement)
            rows('W', 1, pass2, e.lon, e.lat, e.holesLon, e.holesLat)
          }
        asArea ++ leftovers
    }
  }

  final case class Result(bytes: Array[Byte], parsed: OmaFile)

  /** End-to-end: parse -> reunify -> tile -> classify -> write. */
  def run(spark: SparkSession, xml: String, bbsText: String, typeText: String,
          features: Int, zip: Boolean, oneElement: Boolean): Result =
    run(spark, OsmXml.parse(xml), bbsText, typeText, features, zip, oneElement)

  /** Same, from an already-parsed input (any source format — XML/O5M/PBF). */
  def run(spark: SparkSession, input: OsmInput, bbsText: String, typeText: String,
          features: Int, zip: Boolean, oneElement: Boolean): Result =
    runFrom(spark, prepare(spark, input, bbsText, typeText, features, zip, oneElement),
      features, zip, oneElement)

  /** Same, from the scans' distributed element stream. */
  def run(spark: SparkSession, rows: Dataset[OsmRow], bbsText: String, typeText: String,
          features: Int, zip: Boolean, oneElement: Boolean): Result =
    runFrom(spark, prepare(spark, rows, bbsText, typeText, features, zip, oneElement),
      features, zip, oneElement)

  private def runFrom(spark: SparkSession, p: Prepared,
                      features: Int, zip: Boolean, oneElement: Boolean): Result = {
    val parts = p.bodies.collect().sortBy(t => (t._1, t._2, t._3))
    val chunkParts = parts.toSeq.map { case (_, tile, _, kindStr, body) =>
      (kindStr.charAt(0), p.boundsOf(tile), body)
    }
    val feat = features | (if (oneElement) OmaWire.FeatOneElement else 0)
    val bytes = OmaWriter.writeFileFromParts(feat, p.headerBbox, zip, p.catalog, chunkParts)
    Result(bytes, OmaReader.read(bytes))
  }

  /** Streamed sink: executors write each chunk body to its own part file
    * (in local mode a shared temp dir; on a real cluster this path would be
    * shared storage), the driver collects ONLY per-chunk metadata, then
    * stream-concatenates part files into the final .oma and patches the
    * chunk-table pointer. Driver memory is O(chunk table) + one copy
    * buffer, never O(container bytes). Byte-identical to [[run]] by
    * construction (asserted in OmaScanSpec).
    * Returns the chunk table (start offset, kind, bounds).
    */
  def runToFile(spark: SparkSession, input: OsmInput, bbsText: String, typeText: String,
                features: Int, zip: Boolean, oneElement: Boolean,
                outPath: String,
                store: graft.sources.PartStore): Seq[(Long, Char, Bbox)] =
    runToFileFrom(spark, prepare(spark, input, bbsText, typeText, features, zip, oneElement),
      features, zip, oneElement, outPath, store)

  /** Fully distributed end-to-end conversion: a scan Dataset in, a streamed
    * .oma file out — the planet shape (no OsmInput ever exists).
    */
  def runToFile(spark: SparkSession, rows: Dataset[OsmRow], bbsText: String, typeText: String,
                features: Int, zip: Boolean, oneElement: Boolean,
                outPath: String,
                store: graft.sources.PartStore = graft.sources.PartStore.local): Seq[(Long, Char, Bbox)] =
    runToFileFrom(spark, prepare(spark, rows, bbsText, typeText, features, zip, oneElement),
      features, zip, oneElement, outPath, store)

  private def runToFileFrom(spark: SparkSession, p: Prepared,
                            features: Int, zip: Boolean, oneElement: Boolean,
                            outPath: String,
                            store: graft.sources.PartStore): Seq[(Long, Char, Bbox)] = {
    // all part-file IO through the PartStore seam — shared storage plugs in
    // here on a real cluster (see graft.sources.PartStore)
    val tmpDir = store.mkTempDir()
    import spark.implicits._
    val meta = p.bodies.mapPartitions { it =>
      it.map { case (kr, tile, sub, kind, body) =>
        val f = s"$tmpDir/part_${kr}_${tile}_$sub"
        store.write(f, body)
        (kr, tile, sub, kind, body.length.toLong, f)
      }
    }.collect().sortBy(t => (t._1, t._2, t._3))

    val feat = features | (if (oneElement) OmaWire.FeatOneElement else 0)
    val (header, ptrPos) = OmaWriter.headerBytes(feat, p.headerBbox, zip, p.catalog)
    val fos = store.create(outPath)
    val table = Seq.newBuilder[(Long, Char, Bbox)]
    try {
      fos.write(header)
      var off = header.length.toLong
      val buf = new Array[Byte](1 << 16)
      meta.foreach { case (_, tile, _, kindStr, len, path) =>
        table += ((off, kindStr.charAt(0), p.boundsOf(tile)))
        val in = store.open(path)
        try {
          var n = in.read(buf)
          while (n > 0) { fos.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        store.delete(path)
        off += len
      }
      val entries = table.result()
      val tb = new OmaBuf
      tb.writeInt(entries.length)
      entries.foreach { case (start, t, b) =>
        tb.writeLong(start); tb.writeByte(t)
        tb.writeInt(b.minLon); tb.writeInt(b.minLat); tb.writeInt(b.maxLon); tb.writeInt(b.maxLat)
      }
      fos.write(tb.toBytes)
      fos.flush()
      fos.close()
      store.patchLong(outPath, ptrPos, off)
      entries
    } finally {
      fos.close()
      store.deleteDir(tmpDir)
    }
  }

  private final case class Prepared(
      bodies: Dataset[(Int, Int, Int, String, Array[Byte])],
      catalog: Seq[(Char, Seq[(String, Seq[String])])],
      headerBbox: Bbox, index: TileIndex) {
    def boundsOf(tile: Int): Bbox =
      if (tile < index.bounds.length) index.bounds(tile) else Bbox.NoBounds
  }

  /** Everything up to (but excluding) the driver-side assembly: reunify,
    * tile, classify, and serialize chunk bodies on executors. */
  private def prepare(spark: SparkSession, input: OsmInput, bbsText: String, typeText: String,
                      features: Int, zip: Boolean, oneElement: Boolean): Prepared =
    prepareFrom(spark, ReunifySpark.reunify(spark, input), bbsText, typeText,
      features, zip, oneElement)

  /** Distributed-ingest variant: the element stream arrives as the scans'
    * Dataset[OsmRow] — nothing element-level ever materializes driver-side.
    */
  private def prepare(spark: SparkSession, rows: Dataset[OsmRow], bbsText: String, typeText: String,
                      features: Int, zip: Boolean, oneElement: Boolean): Prepared =
    prepareFrom(spark, ReunifySpark.reunify(spark, rows), bbsText, typeText,
      features, zip, oneElement)

  private def prepareFrom(spark: SparkSession, reunified: (Option[Bbox], Dataset[El]),
                          bbsText: String, typeText: String,
                          features: Int, zip: Boolean, oneElement: Boolean): Prepared = {
    val cfg = TypeConfig.parse(typeText)
    val (bboxOpt, els) = reunified
    val inputBounds = bboxOpt.getOrElse(Bbox.WholeWorld)
    val index = new TileIndex(Bbs.expand(Bbs.parse(bbsText), inputBounds))
    val headerBbox = bboxOpt.getOrElse(Bbox.NoBounds)

    import spark.implicits._
    val cfgB = spark.sparkContext.broadcast(cfg)
    val idxB = spark.sparkContext.broadcast(index)

    val classified: Dataset[ClassifiedRow] = els.flatMap { e0 =>
      // step-2 sentinel collapse on mutable copies
      val lon = e0.lon.clone(); val lat = e0.lat.clone()
      collapse(lon, lat)
      val hLon = e0.holesLon.map(_.clone()); val hLat = e0.holesLat.map(_.clone())
      var k = 0
      while (k < hLon.length) { collapse(hLon(k), hLat(k)); k += 1 }
      val e = e0.copy(lon = lon, lat = lat, holesLon = hLon, holesLat = hLat)
      val tile = tileOf(idxB.value, e.kind, lon, lat, hLon, hLat)
      classifyElement(cfgB.value, oneElement, e, tile)
    }

    val catalog = Seq(
      'N' -> cfg.nodeKeys.zip(cfg.nodeValues.map(_.toSeq)).map { case (k, v) => (k, v) }.toSeq,
      'W' -> cfg.wayKeys.zip(cfg.wayValues.map(_.toSeq)).map { case (k, v) => (k, v) }.toSeq,
      'A' -> cfg.wayKeys.zip(cfg.areaValues.map(_.toSeq)).map { case (k, v) => (k, v) }.toSeq,
      'C' -> cfg.collKeys.zip(cfg.collValues.map(_.toSeq)).map { case (k, v) => (k, v) }.toSeq)

    // DISTRIBUTED sink: repartition by chunk key so every chunk's rows land
    // whole in one partition, sort within partitions (block -> slice ->
    // input seq), and serialize each chunk to position-independent bytes in
    // the executors (chunk-internal offsets are chunk-relative and the
    // delta codec resets per slice). The driver only concatenates the
    // per-chunk bodies in chunk-table order and patches the offsets —
    // nothing element-level ever crosses to the driver.
    val zipCap = zip
    val featuresCap = features
    val bodies = classified
      .repartition($"kindRank", $"tile", $"subPass")
      .sortWithinPartitions("kindRank", "tile", "subPass", "blockIdx", "sliceOrder", "sliceValue", "seq")
      .mapPartitions { it =>
        val cfgL = cfgB.value
        val bit = it.buffered
        new Iterator[(Int, Int, Int, String, Array[Byte])] {
          def hasNext: Boolean = bit.hasNext
          def next(): (Int, Int, Int, String, Array[Byte]) = {
            val h = bit.head
            val ck = (h.kindRank, h.tile, h.subPass)
            val chunkRows = scala.collection.mutable.ArrayBuffer.empty[ClassifiedRow]
            while (bit.hasNext &&
              (bit.head.kindRank, bit.head.tile, bit.head.subPass) == ck) chunkRows += bit.next()
            val outKind = chunkRows.head.outKind.charAt(0)
            val keys = cfgL.keysFor(outKind)
            val blocks = groupOrdered(chunkRows.toSeq)(_.blockIdx).map { case (bIdx, blockRows) =>
              val key = if (bIdx == keys.length) "" else keys(bIdx)
              val slices = groupOrdered(blockRows)(r => (r.sliceOrder, r.sliceValue)).map {
                case ((_, v), sliceRows) =>
                  // rows arrive sorted by seq: slice content order = chunk input order
                  val els = sliceRows.map { r => (out: OmaBuf, ds: DeltaState) =>
                    val (lo, la, hLo, hLa) =
                      if (outKind == 'A') {
                        // write-time ring normalization (Area.sortRings)
                        val l = r.lon.clone(); val a = r.lat.clone()
                        val hl = r.holesLon.map(_.clone()); val ha = r.holesLat.map(_.clone())
                        Geo.normalizeRings(l, a, hl, ha)
                        (l, a, hl, ha)
                      } else (r.lon, r.lat, r.holesLon, r.holesLat)
                    OmaWriter.writeElement(out, ds, outKind, featuresCap, lo, la, hLo, hLa,
                      r.tags.toSeq.sortBy(_._1), r.members.toIndexedSeq, r.meta)
                  }
                  (v, els)
              }
              (key, slices)
            }
            (ck._1, ck._2, ck._3, outKind.toString, OmaWriter.writeChunkBody(blocks, zipCap))
          }
        }
      }

    Prepared(bodies, catalog, headerBbox, index)
  }

  /** group consecutive-equal keys from already-sorted input, preserving order. */
  private def groupOrdered[T, K](rows: Seq[T])(key: T => K): Seq[(K, Seq[T])] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[K, scala.collection.mutable.ArrayBuffer[T]]
    rows.foreach(r => out.getOrElseUpdate(key(r), scala.collection.mutable.ArrayBuffer.empty) += r)
    out.toSeq.map { case (k, v) => (k, v.toSeq) }
  }
}
