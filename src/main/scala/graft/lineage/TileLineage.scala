package graft.lineage

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Checkpointed tiled writes with per-partition lineage, so a killed job
  * resumes idempotently (the north rule's resumability requirement):
  *
  *  - data lands under `root/tile=<t>/` (one partition dir per tile)
  *  - after each successful write, one manifest line per tile records
  *    {tile, rows, digest, lon/lat range} in `root/_manifest.jsonl`
  *  - a re-run loads the manifest first and only writes missing tiles;
  *    a tile whose data was written but not manifested (the crash window)
  *    is rewritten via dynamic partition overwrite — write-then-manifest
  *    makes the manifest the commit point
  *
  * The digest is an order-insensitive bit_xor over xxhash64 of the full row,
  * so any row-level corruption or loss flips it.
  */
object TileLineage {

  final case class TileStat(tile: Long, rows: Long, digest: Long,
                            minLon: Long, maxLon: Long, minLat: Long, maxLat: Long)
  final case class WriteSummary(written: Seq[TileStat], skipped: Seq[Long])

  private def manifestPath(root: String) = Paths.get(root, "_manifest.jsonl")

  def readManifest(root: String): Seq[TileStat] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) return Seq.empty
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      // fixed field order written by us; no external json lib needed
      val m = line.stripPrefix("{").stripSuffix("}").split(",")
        .map(_.split(":")).map(a => a(0).replaceAll("\"", "").trim -> a(1).trim.toLong).toMap
      TileStat(m("tile"), m("rows"), m("digest"), m("minLon"), m("maxLon"), m("minLat"), m("maxLat"))
    }
  }

  private def appendManifest(root: String, stats: Seq[TileStat]): Unit = {
    val lines = stats.map(s =>
      s"""{"tile":${s.tile},"rows":${s.rows},"digest":${s.digest},"minLon":${s.minLon},"maxLon":${s.maxLon},"minLat":${s.minLat},"maxLat":${s.maxLat}}""")
    Files.createDirectories(Paths.get(root))
    Files.write(manifestPath(root), (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Compute per-tile lineage stats for a DataFrame with a `tile` column. */
  def stats(df: DataFrame): Seq[TileStat] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.filter(_ != "tile").sorted.map(c => col(c).cast("string"))
    df.withColumn("h", xxhash64(concat_ws("", cols.toIndexedSeq: _*)))
      .groupBy(col("tile").cast("long").as("tile"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("digest"),
        min(col("lon")).cast("long").as("minLon"), max(col("lon")).cast("long").as("maxLon"),
        min(col("lat")).cast("long").as("minLat"), max(col("lat")).cast("long").as("maxLat"))
      .as[TileStat].collect().toSeq.sortBy(_.tile)
  }

  /** Idempotent tiled write with INCREMENTAL commit: skips tiles already
    * manifested, then writes the missing ones in tile-groups of
    * `groupSize`, committing each group's manifest lines as soon as its
    * data lands — so the commit granularity (and the redo window after a
    * crash) is one group, not the whole batch. Per group the stats are
    * recomputed from the files ON DISK (the audit path's source of truth),
    * and the upstream frame is persisted once — the round-3 shape
    * (stats(remaining) then a second full execution for the write, one
    * manifest append at the very end) double-paid the upstream computation
    * and redid the entire batch on any crash.
    *
    * `failAfterGroups` is a crash-injection hook for LineageSpec: the write
    * aborts (as a crash would) after that many groups have committed.
    */
  def writeTiled(df: DataFrame, root: String, groupSize: Int = 256,
                 failAfterGroups: Int = Int.MaxValue): WriteSummary = {
    // tiles are non-null by contract (the tile encoder is total — the
    // catch-all tile absorbs everything); assert rather than let a null
    // slip past the left_anti resume (the old !isin filter dropped nulls,
    // left_anti RETAINS them, and a null tile would then blow up the
    // non-nullable TileStat decode on every subsequent resume). The scan
    // only runs when the schema can't prove non-nullability.
    if (df.schema("tile").nullable)
      require(df.filter(col("tile").isNull).isEmpty,
        "writeTiled: null tile keys — the tile encoder must be total")
    val spark = df.sparkSession
    val done = readManifest(root).map(_.tile).toSet
    // broadcast anti-join, not isin(...): at ~43k manifested tiles an isin
    // literal list is a giant expression tree; the anti-join stays O(1) in
    // plan size and broadcasts a few hundred KB of done keys
    val remaining =
      if (done.isEmpty) df
      else {
        import spark.implicits._
        val doneDf = done.toSeq.sorted.toDF("tile")
          .select(col("tile").cast(df.schema("tile").dataType))
        df.join(broadcast(doneDf), Seq("tile"), "left_anti")
      }
    remaining.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tiles = remaining.select(col("tile").cast("long")).distinct()
        .collect().map(_.getLong(0)).sorted
      val written = Seq.newBuilder[TileStat]
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      tiles.grouped(groupSize).zipWithIndex.foreach { case (group, g) =>
        if (g >= failAfterGroups)
          throw new IllegalStateException(s"injected crash after $g committed groups")
        val inGroup = col("tile").cast("long").isin(group.toIndexedSeq: _*)
        remaining.filter(inGroup).write.mode(SaveMode.Overwrite)
          .partitionBy("tile")
          .parquet(root + "/data")
        // stats from the bytes that actually landed (partition-pruned read
        // of just this group's tile directories) — commit what IS, not what
        // was intended; also the second execution of `remaining` goes away
        val onDisk = stats(spark.read.parquet(root + "/data").filter(inGroup))
        appendManifest(root, onDisk)
        written ++= onDisk
      }
      WriteSummary(written.result(), done.toSeq.sorted)
    } finally remaining.unpersist()
  }

  /** Recompute digests from what's on disk and diff against the manifest —
    * the audit path.
    */
  def audit(spark: org.apache.spark.sql.SparkSession, root: String): Seq[(Long, Boolean)] = {
    val manifest = readManifest(root)
    val onDisk = stats(spark.read.parquet(root + "/data"))
    val byTile = onDisk.map(s => s.tile -> s).toMap
    manifest.map(m => m.tile -> byTile.get(m.tile).contains(m.copy()))
  }
}
