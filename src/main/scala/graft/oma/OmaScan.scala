package graft.oma

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.Bbox
import graft.sources.RangeStore

/** Queryable .oma scan with chunk-table pruning — the access pattern the
  * container format exists for (the reader side of TypeAnalysis.java:
  * 696-712): given a bbox predicate, read ONLY the header and the chunk
  * table (driver-side, metadata-only), prune chunks whose bounds do not
  * intersect the bbox, and decode the surviving chunks in parallel on
  * executors, each reading just its own [start, end) byte range.
  *
  * Pruning is an IO optimization with a completeness guarantee: an element
  * assigned to a chunk is CONTAINED in that chunk's bounds (first-match
  * whole-element containment, ChunkGenerator.java:549-574), so any element
  * intersecting the query bbox lives in a chunk that intersects it too —
  * pruned chunks cannot hold matching elements. (The catch-all chunk has
  * the whole-world bounds and is therefore never pruned.)
  */
object OmaScan {

  final case class ChunkRef(idx: Int, start: Long, end: Long, ctype: String, bounds: Bbox)
  final case class Header(features: Int, compression: String, bbox: Bbox, chunks: Seq[ChunkRef])

  /** One decoded element row. */
  final case class OmaScanRow(
      chunk: Int, ctype: String, key: String, value: String,
      id: Long, lon: Seq[Int], lat: Seq[Int], nHoles: Int,
      tags: Map[String, String], nMembers: Int)

  /** Driver-side metadata read: header fields + chunk table ONLY — chunk
    * bodies are never touched (range-read the table, then the header run).
    * All IO goes through the [[graft.sources.RangeStore]] seam so a cluster
    * deployment swaps shared storage in at one place.
    */
  def header(path: String, store: RangeStore = RangeStore.local): Header = {
    {
      val fileLen = store.length(path)
      val fixed = store.readRange(path, 0L, 29)
      val fin = new OmaReader.In(fixed)
      require(fin.readByte() == 'O' && fin.readByte() == 'M' && fin.readByte() == 'A', "bad magic")
      fin.readByte() // version
      val features = fin.readByte()
      val bbox = Bbox(fin.readInt(), fin.readInt(), fin.readInt(), fin.readInt())
      val chunkTablePos = fin.readLong()

      require(fileLen - chunkTablePos <= Int.MaxValue, "chunk table exceeds 2 GiB")
      val tableBytes = store.readRange(path, chunkTablePos, (fileLen - chunkTablePos).toInt)
      val tin = new OmaReader.In(tableBytes)
      val n = tin.readInt()
      val refs0 = (0 until n).map { _ =>
        (tin.readLong(), tin.readByte().toChar,
          Bbox(tin.readInt(), tin.readInt(), tin.readInt(), tin.readInt()))
      }
      val starts = refs0.map(_._1).sorted
      val refs = refs0.zipWithIndex.map { case ((start, ctype, cb), i) =>
        ChunkRef(i, start, starts.find(_ > start).getOrElse(chunkTablePos), ctype.toString, cb)
      }

      // optional headers (compression flag) live between the fixed header
      // and the first chunk — a bounded region we can now read exactly
      val headerEnd = if (refs.nonEmpty) refs.map(_.start).min else chunkTablePos
      val hdrBytes = store.readRange(path, 29L, (headerEnd - 29).toInt)
      val hin = new OmaReader.In(hdrBytes)
      var compression = "NONE"
      var done = false
      while (!done) {
        val h = hin.readByte()
        (h & 127).toChar match {
          case 'c' => hin.readInt(); compression = hin.readString()
          case 't' => val end = hin.readInt(); hin.pos = end - 29
          case 0 => done = true
          case other => throw new IllegalStateException(s"unknown header '$other'")
        }
        if (h == 0) done = true
      }
      Header(features, compression, bbox, refs)
    }
  }

  def pruned(h: Header, box: Bbox): Seq[ChunkRef] =
    h.chunks.filter(c => c.bounds.intersects(box))

  /** Bbox-pruned element scan: only intersecting chunks are read/decoded,
    * in parallel, one executor task per chunk byte-range. */
  def query(spark: SparkSession, path: String, box: Bbox,
            store: RangeStore = RangeStore.local): Dataset[OmaScanRow] = {
    val h = header(path, store)
    val keep = pruned(h, box)
    scanRefs(spark, path, h, keep, store)
  }

  /** Full scan (no predicate) — same distribution. */
  def scan(spark: SparkSession, path: String,
           store: RangeStore = RangeStore.local): Dataset[OmaScanRow] = {
    val h = header(path, store)
    scanRefs(spark, path, h, h.chunks, store)
  }

  private def scanRefs(spark: SparkSession, path: String, h: Header,
                       refs: Seq[ChunkRef], store: RangeStore): Dataset[OmaScanRow] = {
    import spark.implicits._
    val zip = h.compression == "DEFLATE"
    val features = h.features
    val parts = math.min(spark.sparkContext.defaultParallelism, math.max(1, refs.size))
    spark.createDataset(refs).repartition(parts).flatMap { ref =>
      val body = store.readRange(path, ref.start, (ref.end - ref.start).toInt)
      OmaReader.readChunkBody(body, ref.ctype.head, features, zip).flatMap { b =>
        b.slices.flatMap { s =>
          s.elements.map { e =>
            OmaScanRow(ref.idx, ref.ctype, b.key, s.value, e.meta.id,
              e.lon, e.lat, e.holesLon.size, e.tags, e.members.size)
          }
        }
      }
    }
  }
}
