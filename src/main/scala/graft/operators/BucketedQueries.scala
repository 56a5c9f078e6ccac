package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.ImageTable

/** Bucketed (pre-partitioned) storage co-location: both sides of the
  * image-to-tile-manifest join are written `bucketBy(tile)` with the same
  * bucket count, so the join needs NO shuffle — each task reads matching
  * buckets from both tables (PlanSpec asserts the exchange-free plan). This
  * is the storage-level answer to the repeated-join-on-tile workload: at
  * 100 TB the big fact table is bucketed once at ingest and every
  * subsequent tile join is map-side.
  */
object BucketedQueries {

  val Buckets = 16

  /** Write (or refresh) the two bucketed tables for `dir` and return their
    * catalog names. Idempotent per (session, dir); keyed by the full
    * sanitized path PLUS the source parquet's mtime+size, so distinct dirs
    * can never collide and a changed source re-stages instead of silently
    * serving stale buckets. */
  def ensureTables(s: SparkSession, dir: String): (String, String) = {
    val src = java.nio.file.Paths.get(dir, "documents.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
    val tag = (dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + stamp).toLowerCase
    val (imgT, statT) = (s"g_img_bucketed_$tag", s"g_tilestats_bucketed_$tag")
    if (!s.catalog.tableExists(imgT)) {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_bucketed_$tag").toString
      val img = ImageTable.df(s, dir)
        .select(col("image_id"), GeoQueries.tileCol.as("tile"), col("phash"))
      img.write.mode(SaveMode.Overwrite)
        .bucketBy(Buckets, "tile").sortBy("tile")
        .option("path", s"$root/img").saveAsTable(imgT)
      img.groupBy("tile").agg(count(lit(1)).as("cnt"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(Buckets, "tile").sortBy("tile")
        .option("path", s"$root/stats").saveAsTable(statT)
    }
    (imgT, statT)
  }

  /** The co-located join itself (no orderBy, so the plan is pure join —
    * used by PlanSpec to assert zero Exchange). */
  def colocatedJoin(s: SparkSession, dir: String): DataFrame = {
    val (imgT, statT) = ensureTables(s, dir)
    s.table(imgT).join(s.table(statT), Seq("tile"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("g_bucketed_join", {
      val tile = graft.core.Bbs.firstMatchPointSql(
        GeoQueries.rows, "CAST(lon AS BIGINT)", "CAST(lat AS BIGINT)", graft.core.Bbs.duckdbDiv)
      s"""WITH t AS (SELECT image_id, CAST(($tile) AS BIGINT) AS tile, phash
         |           FROM ${ImageTable.duckSql()}),
         |c AS (SELECT tile, COUNT(*) AS cnt FROM t GROUP BY tile)
         |SELECT t.image_id, t.tile, t.phash, c.cnt
         |FROM t JOIN c USING (tile) ORDER BY image_id""".stripMargin
    }) { (s, dir) =>
      colocatedJoin(s, dir)
        .select("image_id", "tile", "phash", "cnt")
        .orderBy("image_id")
    }
  )
}
