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

  /** Idempotent tiled write with INCREMENTAL commit, in ONE upstream pass:
    * skips tiles already manifested, writes every missing tile in a single
    * job partitioned by (grp, tile) — grp = tile div groupSize, a pure
    * function of the tile so a rewrite always replaces the same directory —
    * then commits manifest lines group-by-group from the files ON DISK
    * (each group's stats read lists only its own `grp=<g>` directory, so
    * the read-back is physically pruned by construction, no partition-
    * column filter to mis-type). The commit granularity (and the redo
    * window after a crash between write-completion and a group's manifest
    * append) stays one group; the round-4 shape (one filtered write + one
    * filtered stats read PER group over a persisted frame) paid
    * ~tiles/groupSize full passes over the cached upstream where this pays
    * exactly one, plus per-group reads of only the new bytes.
    *
    * A crash DURING the single write commits nothing (Spark's job-level
    * output commit) and the resume rewrites all unmanifested tiles into
    * their deterministic (grp, tile) directories via dynamic partition
    * overwrite — stale uncommitted data can never survive a resume.
    *
    * `failAfterGroups` is a crash-injection hook for LineageSpec: the
    * commit loop aborts (as a crash would) after that many groups'
    * manifest lines have landed.
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
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    remaining
      .withColumn("grp", expr(s"CAST(tile AS BIGINT) DIV $groupSize"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("grp", "tile")
      .parquet(root + "/data")
    // commit loop: list the grp directories that exist on disk (Hadoop FS —
    // works on any object store, not just local files) and manifest each
    // group from its own bytes — commit what IS, not what was intended
    val dataPath = new org.apache.hadoop.fs.Path(root + "/data")
    val fs = dataPath.getFileSystem(spark.sessionState.newHadoopConf())
    val grps =
      if (!fs.exists(dataPath)) Seq.empty[Long]
      else fs.listStatus(dataPath).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("grp="))
        .map(_.stripPrefix("grp=").toLong).sorted
    val written = Seq.newBuilder[TileStat]
    // crash injection counts COMMITTED groups (manifest appends), not
    // iterated grp dirs: on a resumed root the first dirs are usually
    // fully-committed no-ops, and the injected crash must still land
    // after the promised number of real commits
    var committed = 0
    grps.foreach { g =>
      if (committed >= failAfterGroups)
        throw new IllegalStateException(s"injected crash after $committed committed groups")
      // a resumed run's grp dir also holds previously-committed tiles:
      // select only the FRESH tile directories (filesystem metadata, no
      // data bytes touched for committed tiles — a fully-resumed no-op
      // re-reads nothing), read them with basePath so the partition
      // columns survive, and manifest from those bytes
      val fresh = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data/grp=$g"))
        .toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("tile=") &&
          !done(p.getName.stripPrefix("tile=").toLong))
      if (fresh.nonEmpty) {
        val onDisk = stats(
          spark.read.option("basePath", root + "/data")
            .parquet(fresh.map(_.toString): _*).drop("grp"))
        appendManifest(root, onDisk)
        written ++= onDisk
        committed += 1
      }
    }
    WriteSummary(written.result(), done.toSeq.sorted)
  }

  /** Recompute digests from what's on disk and diff against the manifest —
    * the audit path.
    */
  def audit(spark: org.apache.spark.sql.SparkSession, root: String): Seq[(Long, Boolean)] = {
    val manifest = readManifest(root)
    val onDisk = stats(spark.read.parquet(root + "/data").drop("grp"))
    val byTile = onDisk.map(s => s.tile -> s).toMap
    manifest.map(m => m.tile -> byTile.get(m.tile).contains(m.copy()))
  }
}
