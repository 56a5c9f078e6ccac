package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.core.PortableHash
import graft.oma._
import graft.sources.ImageTable

/** Driver-gate queries for the binary input scans (S3 o5m / S4 pbf): a
  * deterministic OSM element set is derived from the `part` table, encoded
  * to a real .o5m / .pbf file, scanned back through the distributed scan
  * operators, and flattened to a per-row table the DuckDB oracle recomputes
  * directly from `part` — so the gate exercises encoder + decoder + scan
  * end-to-end against an independent reimplementation of the expected
  * content. (Encoder fidelity itself is separately golden-diffed against
  * oma.jar in BinaryGoldenSpec.)
  *
  * Every part row becomes a node (md5-derived geotag, the uid%101==0 rows
  * exercise the o5m uid-0 encoding), every third a way (signed ref deltas),
  * every fifth a relation (all three member types, repeated roles through
  * the o5m string-pair table).
  */
object BinaryScanQueries {

  private def usr(k: Long) = s"user${k % 13}"

  /** Deterministic element set from the part table (collected: building a
    * single binary FILE is inherently a serial fixture step; the scan side
    * stays distributed). */
  private def scanInput(s: SparkSession, dir: String): OsmInput = {
    val rows = s.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").cast("long").as("k"),
        (ImageTable.h60(concat(lit("nlon:"), col("p_partkey"))) % 3600000001L - 1800000000L)
          .cast("int").as("lon"),
        (ImageTable.h60(concat(lit("nlat:"), col("p_partkey"))) % 1800000001L - 900000000L)
          .cast("int").as("lat"))
      .orderBy("k")
      .collect()

    def meta(k: Long) = Meta(k, (k % 9 + 1).toInt, 1577836800L + k * 37, 7000 + k,
      (k % 101).toInt, usr(k))
    def tags(k: Long): Map[String, String] =
      if (k % 4 != 0) Map("amenity" -> s"v${k % 7}", "name" -> s"n${k % 11}")
      else Map.empty

    val nodes = rows.map { r =>
      val k = r.getLong(0)
      OsmNode(meta(k), r.getInt(1), r.getInt(2), tags(k))
    }.toSeq
    val ways = rows.map(_.getLong(0)).filter(_ % 3 == 0).map { k =>
      OsmWay(meta(k), Seq(k + 5, k, k + 9), tags(k)) // signed deltas
    }.toSeq
    val rels = rows.map(_.getLong(0)).filter(_ % 5 == 0).map { k =>
      OsmRelation(meta(k), Seq(
        OsmMember("node", k + 1, "via"),
        OsmMember("way", k + 2, "from"),
        OsmMember("relation", k + 3, s"r${k % 3}")), tags(k))
    }.toSeq
    OsmInput(None, nodes, ways, rels)
  }

  /** key = full sanitized path + source parquet mtime+size: distinct dirs
    * never collide and a changed source regenerates. */
  private def dirKey(dir: String): String = {
    val src = Paths.get(dir, "part.parquet")
    val stamp = s"${Files.getLastModifiedTime(src).toMillis}_${Files.size(src)}"
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + stamp
  }

  /** Encode once per (sf dir, format) into a temp file. The o5m fixture is
    * written with a reset every 256 elements (the chunking real tools
    * emit), so the gate exercises the segment-PARALLEL o5m decode; "v2" in
    * the name keys the cache to this writer config. */
  private def binFile(s: SparkSession, dir: String, fmt: String): String = synchronized {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_binscan2_${dirKey(dir)}.$fmt")
    if (!Files.exists(p)) {
      val in = scanInput(s, dir)
      val bytes = if (fmt == "o5m") O5m.write(in, resetEvery = 256) else Pbf.write(in, perBlock = 256)
      Files.write(p, bytes)
    }
    p.toString
  }

  /** Flatten the scan rows to the oracle-comparable table. */
  private def flat(df: DataFrame): DataFrame =
    df.select(
      col("kind"), col("id"),
      col("version").cast("long").as("version"),
      col("ts"), col("cs"),
      col("uid").cast("long").as("uid"),
      col("user").as("usr"),
      col("lon").cast("long").as("lon"), col("lat").cast("long").as("lat"),
      size(col("nds")).cast("long").as("n_refs"),
      expr("aggregate(nds, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_refs"),
      size(col("mrefs")).cast("long").as("n_members"),
      array_join(col("mroles"), ",").as("roles"),
      expr("aggregate(mrefs, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_mrefs"),
      coalesce(element_at(col("tags"), "amenity"), lit("")).as("tag_amenity"),
      coalesce(element_at(col("tags"), "name"), lit("")).as("tag_name"))
      .orderBy("kind", "id")

  private val oracleSql: String = {
    val lon = s"CAST(${PortableHash.duckSql("('nlon:' || CAST(k AS VARCHAR))")} % 3600000001 - 1800000000 AS BIGINT)"
    val lat = s"CAST(${PortableHash.duckSql("('nlat:' || CAST(k AS VARCHAR))")} % 1800000001 - 900000000 AS BIGINT)"
    def metaCols =
      """CAST(k % 9 + 1 AS BIGINT) AS version,
        |  CAST(1577836800 + k*37 AS BIGINT) AS ts, CAST(7000 + k AS BIGINT) AS cs,
        |  CAST(k % 101 AS BIGINT) AS uid, 'user' || CAST(k % 13 AS VARCHAR) AS usr""".stripMargin
    def tagCols =
      """CASE WHEN k % 4 <> 0 THEN 'v' || CAST(k % 7 AS VARCHAR) ELSE '' END AS tag_amenity,
        |  CASE WHEN k % 4 <> 0 THEN 'n' || CAST(k % 11 AS VARCHAR) ELSE '' END AS tag_name""".stripMargin
    s"""WITH ks AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part)
       |SELECT 'node' AS kind, k AS id, $metaCols,
       |  $lon AS lon, $lat AS lat,
       |  CAST(0 AS BIGINT) AS n_refs, CAST(0 AS BIGINT) AS sum_refs,
       |  CAST(0 AS BIGINT) AS n_members, '' AS roles, CAST(0 AS BIGINT) AS sum_mrefs,
       |  $tagCols
       |FROM ks
       |UNION ALL
       |SELECT 'way', k, $metaCols, 0, 0,
       |  CAST(3 AS BIGINT), CAST(3*k + 14 AS BIGINT), CAST(0 AS BIGINT), '', CAST(0 AS BIGINT),
       |  $tagCols
       |FROM ks WHERE k % 3 = 0
       |UNION ALL
       |SELECT 'relation', k, $metaCols, 0, 0,
       |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT),
       |  'via,from,r' || CAST(k % 3 AS VARCHAR), CAST(3*k + 6 AS BIGINT),
       |  $tagCols
       |FROM ks WHERE k % 5 = 0
       |ORDER BY kind, id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // oma_query: the .oma READ path — convert part-derived nodes to a real
  // .oma container, then query it back through the chunk-pruned scan
  // (OmaScan) with a bbox predicate. Untagged nodes (k%4==0) are dropped
  // by the pipeline's P2 rule, so the oracle reproduces that too.
  // ---------------------------------------------------------------------

  /** Query bbox: eastern-north quarter-ish of the world. */
  private val QueryBox = graft.core.Bbox(-900000000, 0, 900000000, 900000000)

  private def omaFile(s: SparkSession, dir: String): String = synchronized {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_omascan_${dirKey(dir)}.oma")
    if (!Files.exists(p)) {
      val in = scanInput(s, dir)
      val res = OmaPipeline.run(s, OsmInput(None, in.nodes, Nil, Nil),
        graft.core.Bbs.DefaultBbs, TypeConfig.Minimal,
        features = 31, zip = true, oneElement = false)
      Files.write(p, res.bytes)
    }
    p.toString
  }

  private val omaQueryOracle: String = {
    val lon = s"CAST(${PortableHash.duckSql("('nlon:' || CAST(k AS VARCHAR))")} % 3600000001 - 1800000000 AS BIGINT)"
    val lat = s"CAST(${PortableHash.duckSql("('nlat:' || CAST(k AS VARCHAR))")} % 1800000001 - 900000000 AS BIGINT)"
    s"""WITH ks AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey % 4 <> 0),
       |nodes AS (SELECT k AS id, $lon AS lon, $lat AS lat FROM ks)
       |SELECT id, lon, lat FROM nodes
       |WHERE lon BETWEEN ${QueryBox.minLon} AND ${QueryBox.maxLon}
       |  AND lat BETWEEN ${QueryBox.minLat} AND ${QueryBox.maxLat}
       |ORDER BY id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("o_o5m_scan", oracleSql) { (s, dir) =>
      flat(OsmSource.o5mScan(s, binFile(s, dir, "o5m")).toDF())
    },
    QueryDef.sql("o_pbf_scan", oracleSql) { (s, dir) =>
      flat(OsmSource.pbfScan(s, binFile(s, dir, "pbf")).toDF())
    },
    QueryDef.sql("oma_query", omaQueryOracle) { (s, dir) =>
      OmaScan.query(s, omaFile(s, dir), QueryBox).toDF()
        .filter(col("ctype") === "N")
        .select(col("id"),
          element_at(col("lon"), 1).cast("long").as("lon"),
          element_at(col("lat"), 1).cast("long").as("lat"))
        .filter(col("lon").between(QueryBox.minLon.toLong, QueryBox.maxLon.toLong)
          && col("lat").between(QueryBox.minLat.toLong, QueryBox.maxLat.toLong))
        .orderBy("id")
    }
  )
}
