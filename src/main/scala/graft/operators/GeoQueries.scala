package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.core.{Bbs, PortableHash, TileIndex}
import graft.plans.TileId
import graft.sources.ImageTable

/** The geospatial operator suite over the image+caption table: first-match
  * tile assignment (the reference's chunk generator semantics), per-tile
  * manifest aggregation, the tile-metadata broadcast join, cell-indexed
  * point-in-polygon, exact kNN, and the salted skew aggregation.
  */
object GeoQueries {

  lazy val rows = Bbs.parse(Bbs.DefaultBbs)
  lazy val index = new TileIndex(Bbs.expand(rows))

  private def img(s: SparkSession, dir: String): DataFrame = ImageTable.df(s, dir)

  /** tile id column via the native first-match expression. */
  def tileCol = TileId.point(col("lon"), col("lat"), index).cast("long")

  private[graft] val duckTile = Bbs.firstMatchPointSql(
    rows, "CAST(lon AS BIGINT)", "CAST(lat AS BIGINT)", Bbs.duckdbDiv)
  private def fromImg = s"FROM ${ImageTable.duckSql()}"

  /** g_dist_join radius: 2.0 deg in the 1e-7 fixed-point planar space. */
  val DistR = 20000000L

  /** g_poly_overlap_img square half-side: 4 deg in 1e-7 fixed point. */
  val PolySquareHalf = 40000000L

  /** g_heatmap cell side: 5 deg in the 1e-7 fixed-point space. */
  val HeatCell = 50000000L

  /** g_zorder_scan fixture bbox (75 x 42 deg band) and morton resolution. */
  val ZMinLon = -400000000; val ZMaxLon = 350000000
  val ZMinLat = -100000000; val ZMaxLat = 320000000
  val ZRes = 10

  /** Radius distance self-join — all image pairs within planar distance r,
    * the canonical spatial join besides point-in-polygon and kNN. Grid
    * blocking: each point lands in ONE cell of side r (truncating `div`,
    * matching DuckDB `//`; consecutive cell boundaries are >= r apart, so
    * two points within r differ by at most 1 in each cell coordinate), the
    * probe side fans out to its 3x3 cell neighbourhood, and candidates
    * meet in a shuffle EQUI-join on the (cx, cy) cell key — never a
    * cartesian/BNLJ. The exact integer refine `dx^2+dy^2 <= r^2` runs only
    * on adjacent-cell candidates (|dx|,|dy| <= 2r, squares ~1.6e15 — no
    * Long overflow, unlike naive all-pairs where dx^2 can reach 1.3e19).
    * `id_a < id_b` on the probe side emits each pair exactly once (a
    * point's 9 probe keys are distinct, and a candidate lives in exactly
    * one of them). At 100 TB: fan-out is a fixed 9x, the join shuffles on
    * cell keys whose occupancy tracks local density (cell side = r), and
    * dense metro cells split under AQE skew handling like any hot key.
    * The oracle is the brute-force inequality join with a bbox prefilter —
    * engine and oracle share no algorithm. */
  def distJoin(img: DataFrame, r: Long): DataFrame = {
    // HALF-neighbourhood probing (round 6): the former shape exploded the
    // probe side to all 9 cells of its 3x3 block and kept id_a < id_b,
    // so every unordered pair was generated (and shuffled) twice — once
    // from each endpoint's probe. Probing only the 5-cell half set
    // {(0,0),(1,0),(-1,1),(0,1),(1,1)} meets each adjacent-cell pair
    // exactly once (exactly one of +d/-d is in the set for each of the 4
    // neighbour axes) and each same-cell pair once via id_a < id_b —
    // 5/9 of the probe explode, same result set with least/greatest ids.
    // The cell key packs to ONE long (cx << 32 ^ low32(cy)) — collision-
    // free for |cy| < 2^31, which lat div r guarantees for any r >= 1 —
    // halving the join-key bytes vs the two-column key.
    // payload coordinates ride the exchange as INT32 (the pinned planar
    // domain fits: |lon| <= 1.8e9, |lat| <= 0.9e9 — same assumption the
    // PIP kernel documents); only the cell computation and the exact
    // refine widen to long. With shuffle compression off, narrower
    // columns are bytes saved one-for-one (guide: narrower types).
    val pts = img.select(col("image_id"),
      col("lon").cast("int").as("lon"), col("lat").cast("int").as("lat"))
      .withColumn("cx", expr(s"cast(lon as long) div ${r}L"))
      .withColumn("cy", expr(s"cast(lat as long) div ${r}L"))
    def key(cxE: String, cyE: String) =
      expr(s"shiftleft($cxE, 32) ^ (($cyE) & 4294967295)")
    val build = pts.select(col("image_id").as("id_b"),
      col("lon").as("lon_b"), col("lat").as("lat_b"), key("cx", "cy").as("ck"))
    val probe = pts
      .withColumn("o", explode(array(
        struct(lit(0L).as("ox"), lit(0L).as("oy")),
        struct(lit(1L).as("ox"), lit(0L).as("oy")),
        struct(lit(-1L).as("ox"), lit(1L).as("oy")),
        struct(lit(0L).as("ox"), lit(1L).as("oy")),
        struct(lit(1L).as("ox"), lit(1L).as("oy")))))
      .select(col("image_id").as("id_a"), col("lon").as("lon_a"), col("lat").as("lat_a"),
        key("cx + o.ox", "cy + o.oy").as("ck"),
        (col("o.ox") === 0L && col("o.oy") === 0L).as("same"))
    def dl(c: String) = col(c).cast("long")
    val d2 = (dl("lon_a") - dl("lon_b")) * (dl("lon_a") - dl("lon_b")) +
      (dl("lat_a") - dl("lat_b")) * (dl("lat_a") - dl("lat_b"))
    probe.join(build, Seq("ck"))
      // same-cell pairs dedupe by id order; cross-cell pairs are unique by
      // construction but equal-id pairs (duplicate input ids) still drop,
      // exactly as the former id_a < id_b did
      .filter(when(col("same"), col("id_a") < col("id_b"))
        .otherwise(col("id_a") =!= col("id_b")))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(r * r))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist2"))
      .orderBy("id_a", "id_b")
  }

  /** Deepest tile-pyramid zoom level (g_tile_pyramid). Shifted-positive
    * coords fit 32/31 bits (lon+1.8e9 < 2^32, lat+9e8 < 2^31), so level z
    * uses cell sides 2^(32-z) x 2^(31-z) and the parent of a cell is just
    * cx >> 1, cy >> 1 — a true quadtree. */
  val PyrZMax = 6

  /** Raster-to-vector tile pyramid: per-tile image aggregates (row count,
    * total pixels, first image id) at zoom [[PyrZMax]] rolled up through
    * every ancestor level to z = 0 — the multi-zoom map-tile manifest a
    * serving layer reads. Shape for 100 TB: ONE full shuffle aggregates the
    * n input rows to base cells (map-side combine does most of it), then the
    * bounded base-cell frame explodes x(ZMax+1) ancestor keys into one more
    * tiny groupBy — two exchanges total, no per-level job chain, no driver
    * loop over levels. Rollup relies on the stats being associative
    * (sum/sum/min); the oracle instead aggregates every level directly from
    * the raw rows, so engine and oracle share no algorithm shape. */
  def tilePyramid(img: DataFrame): DataFrame = {
    val base = img.select(
        expr(s"shiftright(CAST(lon AS BIGINT) + 1800000000, ${32 - PyrZMax})").as("cx"),
        expr(s"shiftright(CAST(lat AS BIGINT) + 900000000, ${31 - PyrZMax})").as("cy"),
        (col("w").cast("long") * col("h")).as("pxl"),
        col("image_id"))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("cnt"), sum("pxl").as("px"), min("image_id").as("first_img"))
    base
      .withColumn("z", explode(sequence(lit(0L), lit(PyrZMax.toLong))))
      .groupBy(col("z"),
        expr(s"shiftright(cx, $PyrZMax - CAST(z AS INT))").as("cx"),
        expr(s"shiftright(cy, $PyrZMax - CAST(z AS INT))").as("cy"))
      .agg(sum("cnt").as("cnt"), sum("px").as("px"), min("first_img").as("first_img"))
      .orderBy("z", "cx", "cy")
  }

  /** Per-polygon exact double-area and reference orientation over a
    * (pid, lons, lats) ring frame — g_poly_area's body. Area is the
    * shoelace sum TRANSLATED to the first vertex (raw world-coordinate
    * cross terms reach ~1.6e18 each and their running sum can overflow
    * Long before cancellation; translated deltas are bounded by the ring
    * span, products <= ~6e16). Orientation deliberately replays the
    * reference's Int-overflow quirk (Area.java:128-135 computes
    * (lon[j]-lon[i])*(lat[j]+lat[i]) in 32-bit): both engines run the same
    * wrap-to-int32 arithmetic, here via pmod on Longs (ANSI-safe). */
  def polyArea(polys: DataFrame): DataFrame = {
    def w32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(c + 2147483648L, lit(4294967296L)) - 2147483648L
    val e = polys
      .withColumn("n", size(col("lons")))
      .withColumn("x0", col("lons").getItem(0).cast("long"))
      .withColumn("y0", col("lats").getItem(0).cast("long"))
      .withColumn("i", explode(sequence(lit(0), col("n") - 1)))
      .select(col("pid"), col("n"), col("x0"), col("y0"),
        element_at(col("lons"), col("i") + 1).cast("long").as("x1"),
        element_at(col("lats"), col("i") + 1).cast("long").as("y1"),
        element_at(col("lons"), (col("i") + 1) % col("n") + 1).cast("long").as("x2"),
        element_at(col("lats"), (col("i") + 1) % col("n") + 1).cast("long").as("y2"))
    e.groupBy("pid").agg(
        first(col("n")).cast("long").as("n_vertices"),
        abs(sum((col("x1") - col("x0")) * (col("y2") - col("y0"))
          - (col("x2") - col("x0")) * (col("y1") - col("y0")))).as("area2"),
        when(sum(w32(w32(col("x2") - col("x1")) * w32(col("y2") + col("y1")))) >= 0,
          "cw").otherwise("ccw").as("orient"))
      .select(col("pid").cast("long").as("pid"), col("n_vertices"),
        col("area2"), col("orient"))
      .orderBy("pid")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("g_geotag",
      s"""SELECT image_id, CAST(lon AS BIGINT) AS lon, CAST(lat AS BIGINT) AS lat,
         |  phash, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, fmt, caption
         |$fromImg ORDER BY image_id""".stripMargin) { (s, dir) =>
      img(s, dir).select(col("image_id"), col("lon").cast("long"), col("lat").cast("long"),
        col("phash"), col("w").cast("long"), col("h").cast("long"), col("fmt"), col("caption"))
        .orderBy("image_id")
    },

    QueryDef.sql("g_tile_assign",
      s"""SELECT image_id, CAST(($duckTile) AS BIGINT) AS tile
         |$fromImg ORDER BY image_id""".stripMargin) { (s, dir) =>
      img(s, dir).select(col("image_id"), tileCol.as("tile")).orderBy("image_id")
    },

    QueryDef.sql("g_tile_counts",
      s"""SELECT tile, COUNT(*) AS cnt, MIN(image_id) AS first_img
         |FROM (SELECT image_id, CAST(($duckTile) AS BIGINT) AS tile $fromImg) t
         |GROUP BY tile ORDER BY tile""".stripMargin) { (s, dir) =>
      img(s, dir).select(col("image_id"), tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("cnt"), min("image_id").as("first_img"))
        .orderBy("tile")
    },

    QueryDef.sql("g_bbox_agg",
      s"""SELECT CAST(MIN(lon) AS BIGINT) AS minlon, CAST(MIN(lat) AS BIGINT) AS minlat,
         |  CAST(MAX(lon) AS BIGINT) AS maxlon, CAST(MAX(lat) AS BIGINT) AS maxlat,
         |  COUNT(*) AS n $fromImg""".stripMargin) { (s, dir) =>
      img(s, dir).agg(
        min("lon").cast("long").as("minlon"), min("lat").cast("long").as("minlat"),
        max("lon").cast("long").as("maxlon"), max("lat").cast("long").as("maxlat"),
        count(lit(1)).as("n"))
    },

    QueryDef.sql("g_tile_join", {
      val b = Bbs.tileBoundsSql(rows, "tile", Bbs.duckdbDiv)
        .map { case (n, e) => s"CAST(($e) AS BIGINT) AS $n" }.mkString(",\n  ")
      s"""SELECT image_id, tile, $b
         |FROM (SELECT image_id, CAST(($duckTile) AS BIGINT) AS tile $fromImg) t
         |WHERE tile < ${index.size - 1} ORDER BY image_id""".stripMargin
    }) { (s, dir) =>
      // broadcast tile-metadata join: the small dim side is the bounds list
      val meta = s.createDataFrame(
        index.bounds.zipWithIndex.map { case (bb, i) =>
          (i.toLong, bb.minLon.toLong, bb.minLat.toLong, bb.maxLon.toLong, bb.maxLat.toLong)
        }.toSeq).toDF("tile", "minlon", "minlat", "maxlon", "maxlat")
      img(s, dir).select(col("image_id"), tileCol.as("tile"))
        .filter(col("tile") < index.size - 1)
        .join(broadcast(meta), Seq("tile"))
        .select("image_id", "tile", "minlon", "minlat", "maxlon", "maxlat")
        .orderBy("image_id")
    },

    // radius distance self-join (see distJoin): grid-blocked equi-join
    // engine vs brute-force bbox-prefiltered inequality-join oracle
    QueryDef.sql("g_dist_join",
      // HUGEINT squaring: DuckDB may reorder the refine ahead of the bbox
      // prefilter, and an unfiltered planar delta can reach 3.6e9 whose
      // INT64 square overflows — widen, filter, then narrow the survivors
      s"""WITH p AS (SELECT image_id, CAST(lon AS BIGINT) AS lon,
         |    CAST(lat AS BIGINT) AS lat $fromImg)
         |SELECT id_a, id_b, CAST(d2 AS BIGINT) AS dist2 FROM (
         |  SELECT a.image_id AS id_a, b.image_id AS id_b,
         |    CAST(a.lon - b.lon AS HUGEINT) * (a.lon - b.lon)
         |      + CAST(a.lat - b.lat AS HUGEINT) * (a.lat - b.lat) AS d2
         |  FROM p a JOIN p b ON a.image_id < b.image_id
         |    AND ABS(a.lon - b.lon) <= $DistR AND ABS(a.lat - b.lat) <= $DistR) t
         |WHERE d2 <= ${DistR * DistR}
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      distJoin(img(s, dir), DistR)
    },

    QueryDef.sql("g_pip",
      s"""WITH ${ImageTable.duckCte()}
         |SELECT image_id, mask FROM ${Pip.maskDuckSql()} m
         |ORDER BY image_id""".stripMargin) { (s, dir) =>
      img(s, dir)
        .select(col("image_id"), Pip.mask(col("lon"), col("lat"), Pip.fixtureSet).as("mask"))
        .orderBy("image_id")
    },

    // many-polygon PIP JOIN (see Pip.pipJoin): the polygon set is a
    // DataFrame of 96 edge rings — above the 63-polygon bitmap cap of the
    // g_pip mask path — blocked by grid cell and refined by the codegen
    // ray-cast over array columns. Oracle: brute-force crossing-parity over
    // the literal edge table (no blocking — disjoint algorithms).
    QueryDef.sql("g_pip_join",
      s"""WITH ${ImageTable.duckCte()}
         |${Pip.pipJoinDuckSql("img")}""".stripMargin) { (s, dir) =>
      Pip.pipJoin(
        img(s, dir).select(col("image_id"), col("lon"), col("lat")),
        Pip.polyDf(s, Pip.manyPolygons), Pip.ManyCellSide)
        .select(col("image_id"), col("pid").cast("long").as("pid"))
        .orderBy("image_id", "pid")
    },

    QueryDef.sql("g_knn",
      s"""WITH pts AS (SELECT doc_id AS id, CAST(lon AS DOUBLE) AS x, CAST(lat AS DOUBLE) AS y
         |             ${fromImg}),
         |q AS (SELECT * FROM pts WHERE id % 50 = 0),
         |r AS (SELECT q.id AS qid, p.id AS pid,
         |        row_number() OVER (PARTITION BY q.id
         |          ORDER BY (q.x-p.x)*(q.x-p.x)+(q.y-p.y)*(q.y-p.y), p.id) AS rk
         |      FROM q JOIN pts p ON p.id <> q.id)
         |SELECT qid, CAST(rk AS BIGINT) AS rk, pid FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val pts = img(s, dir).select(col("doc_id").as("id"), col("lon"), col("lat"))
      val qs = pts.filter(col("id") % 50 === 0)
      // density-adaptive grid (size ~ sqrt(area*k/n)); the result is exact
      // kNN for ANY cell size, so the oracle is unaffected
      Knn(pts, qs, k = 3, cellSize = Knn.adaptiveCellSize(pts.count(), 3))
        .select(col("qid"), col("rk").cast("long").as("rk"), col("pid"))
        .orderBy("qid", "rk")
    },

    QueryDef.sql("g_knn_hex",
      s"""WITH pts AS (SELECT doc_id AS id, CAST(lon AS DOUBLE) AS x, CAST(lat AS DOUBLE) AS y
         |             ${fromImg}),
         |q AS (SELECT * FROM pts WHERE id % 40 = 0),
         |r AS (SELECT q.id AS qid, p.id AS pid,
         |        row_number() OVER (PARTITION BY q.id
         |          ORDER BY (q.x-p.x)*(q.x-p.x)+(q.y-p.y)*(q.y-p.y), p.id) AS rk
         |      FROM q JOIN pts p ON p.id <> q.id)
         |SELECT qid, CAST(rk AS BIGINT) AS rk, pid FROM r WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val pts = img(s, dir).select(col("doc_id").as("id"), col("lon"), col("lat"))
      val qs = pts.filter(col("id") % 40 === 0)
      KnnHex(pts, qs, k = 5, res = KnnHex.adaptiveRes(pts.count(), 5))
        .select(col("qid"), col("rk"), col("pid"))
        .orderBy("qid", "rk")
    },

    // polygon-overlap self-join (see Pip.polyOverlapJoin): canonical-cell
    // blocked equi-join + codegen ring-ring intersection vs the all-pairs
    // HUGEINT orientation oracle. Constant fixture set (96 literal rings
    // embedded on both sides — the FrozenOracles precedent), so the result
    // is scale-invariant by construction.
    QueryDef.sql("g_poly_overlap", Pip.polyOverlapDuckSql()) { (s, dir) =>
      Pip.polyOverlapJoin(Pip.polyDf(s, Pip.manyPolygons), Pip.ManyCellSide)
        .orderBy("pid_a", "pid_b")
    },

    // DATA-DEPENDENT polygon overlap: square rings built around every 10th
    // image point run through the same polyOverlapJoin machinery (ring
    // arrays, hierarchical blocking, orientation refine); for axis-aligned
    // squares "intersect incl. touch" reduces to interval overlap on both
    // axes, so the oracle is a plain inequality join — disjoint algorithm,
    // data-driven result at every scale.
    QueryDef.sql("g_poly_overlap_img", {
      val d2 = 2 * PolySquareHalf
      s"""WITH ${ImageTable.duckCte()},
         |s AS (SELECT CAST(doc_id AS BIGINT) AS pid, lon, lat FROM img
         |      WHERE doc_id % 10 = 0)
         |SELECT a.pid AS pid_a, b.pid AS pid_b
         |FROM s a JOIN s b ON a.pid < b.pid
         | AND ABS(CAST(a.lon AS BIGINT) - b.lon) <= $d2
         | AND ABS(CAST(a.lat AS BIGINT) - b.lat) <= $d2
         |ORDER BY pid_a, pid_b""".stripMargin
    }) { (s, dir) =>
      val d = PolySquareHalf
      val squares = img(s, dir).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").cast("int").as("pid"),
          array((col("lon") - d).cast("int"), (col("lon") + d).cast("int"),
            (col("lon") + d).cast("int"), (col("lon") - d).cast("int"),
            (col("lon") - d).cast("int")).as("lons"),
          array((col("lat") - d).cast("int"), (col("lat") - d).cast("int"),
            (col("lat") + d).cast("int"), (col("lat") + d).cast("int"),
            (col("lat") - d).cast("int")).as("lats"))
      Pip.polyOverlapJoin(squares, Pip.ManyCellSide).orderBy("pid_a", "pid_b")
    },

    // z-order layout scan: the bbox query served as morton-range candidates
    // (ZCells.cover — the file-skipping key-range form a z-sorted 100 TB
    // table uses) + the exact residual bbox filter. The oracle is the plain
    // bbox predicate: completeness of the cover IS the thing under test.
    QueryDef.sql("g_zorder_scan",
      s"""SELECT image_id, CAST(lon AS BIGINT) AS lon, CAST(lat AS BIGINT) AS lat
         |$fromImg
         |WHERE lon BETWEEN $ZMinLon AND $ZMaxLon AND lat BETWEEN $ZMinLat AND $ZMaxLat
         |ORDER BY image_id""".stripMargin) { (s, dir) =>
      val ranges = ZCells.cover(ZMinLon, ZMinLat, ZMaxLon, ZMaxLat, ZRes)
      val mz = graft.plans.CellId.morton(col("lon").cast("int"), col("lat").cast("int"), ZRes)
      img(s, dir).withColumn("mz", mz)
        .where(ranges.map { case (lo, hi) => col("mz").between(lo, hi) }.reduce(_ || _))
        .where(col("lon").between(ZMinLon, ZMaxLon) && col("lat").between(ZMinLat, ZMaxLat))
        .select(col("image_id"), col("lon").cast("long").as("lon"),
          col("lat").cast("long").as("lat"))
        .orderBy("image_id")
    },

    // the encoders are trig/Hilbert kernels DuckDB can't reproduce: the
    // oracle is the FROZEN expected table from the deterministic seed
    // (see FrozenOracles; cross-checked by CellsSpec unit properties)
    QueryDef.sql("g_cell_hex", FrozenOracles.gCellHex) { (s, dir) =>
      // native codegen expression (plans.HexCellId), not a row-boxing UDF
      img(s, dir)
        .select(graft.plans.CellId.hex(col("lon").cast("int"), col("lat").cast("int"), 3).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .orderBy("cell")
    },

    QueryDef.sql("g_cell_hilbert", FrozenOracles.gCellHilbert) { (s, dir) =>
      img(s, dir)
        .select(graft.plans.CellId.hilbert(col("lon").cast("int"), col("lat").cast("int"), 8).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .orderBy("cell")
    },

    QueryDef.sql("g_skew_agg",
      s"""SELECT tile, COUNT(*) AS cnt, CAST(SUM(phash % 1000000) AS BIGINT) AS s
         |FROM (SELECT CAST(($duckTile) AS BIGINT) AS tile, phash FROM ${ImageTable.skewedDuckSql()}) t
         |GROUP BY tile ORDER BY tile""".stripMargin) { (s, dir) =>
      // salted two-phase aggregation: partial agg on (tile, salt) defuses the
      // dense-metro hot keys, final agg on tile alone. The salt only spreads
      // the partial-agg keys (never visible in the output), so it uses cheap
      // xxhash64 rather than the md5-derived h60 the oracle-visible columns
      // need.
      val salted = ImageTable.skewed(img(s, dir))
        .select(tileCol.as("tile"), col("phash"),
          pmod(xxhash64(col("image_id")), lit(16)).as("salt"))
      salted
        .groupBy("tile", "salt")
        .agg(count(lit(1)).as("pc"), sum(col("phash") % 1000000).as("ps"))
        .groupBy("tile")
        .agg(sum("pc").as("cnt"), sum("ps").as("s"))
        .orderBy("tile")
    },

    // density heatmap: per-cell point counts plus a 3x3 box-smoothed sum
    // (the KDE-lite raster every map tile server / density-based sampler
    // computes). Engine: cell counts (map-side combine), each OCCUPIED cell
    // fans its count to its 9 neighbours, the smoothed sum regroups on the
    // target cell, and an inner join back to the counts keeps only occupied
    // cells — two shuffles over |cells| rows (<< |points|), never a
    // cartesian. At 100 TB the first agg reduces points to cells map-side,
    // the 9x fan-out is over the (small) cell frame only, and a hot metro
    // cell is ONE row after that first agg — skew dies at the map side.
    // Oracle: a brute-force Chebyshev-distance inequality self-join over
    // the cells — shares no algorithm with the engine's fan-out equi-join.
    QueryDef.sql("g_heatmap",
      s"""WITH pts AS (SELECT ${Bbs.duckdbDiv("CAST(lon AS BIGINT)", s"$HeatCell")} AS cx,
         |    ${Bbs.duckdbDiv("CAST(lat AS BIGINT)", s"$HeatCell")} AS cy $fromImg),
         |c AS (SELECT cx, cy, COUNT(*) AS cnt FROM pts GROUP BY cx, cy)
         |SELECT a.cx, a.cy, a.cnt, CAST(SUM(b.cnt) AS BIGINT) AS smooth
         |FROM c a JOIN c b ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         |GROUP BY a.cx, a.cy, a.cnt ORDER BY a.cx, a.cy""".stripMargin) { (s, dir) =>
      val cells = img(s, dir)
        .select(expr(s"CAST(lon AS BIGINT) div ${HeatCell}L").as("cx"),
          expr(s"CAST(lat AS BIGINT) div ${HeatCell}L").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))
      val smoothed = cells
        .withColumn("ox", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("oy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .groupBy((col("cx") + col("ox")).as("cx"), (col("cy") + col("oy")).as("cy"))
        .agg(sum("cnt").as("smooth"))
      cells.join(smoothed, Seq("cx", "cy"))
        .select(col("cx"), col("cy"), col("cnt"), col("smooth"))
        .orderBy("cx", "cy")
    },

    // polygon area + orientation (see polyArea): the oracle runs the same
    // translated shoelace and wrap32 quirk arithmetic over a literal edge
    // table generated from the 96-ring fixture
    QueryDef.sql("g_poly_area", {
      val rows = Pip.manyPolygons.flatMap { p =>
        val n = p.lon.length
        (0 until n).map { i =>
          val j = (i + 1) % n
          s"(${p.id}, ${p.lon(0)}, ${p.lat(0)}, ${p.lon(i)}, ${p.lat(i)}, ${p.lon(j)}, ${p.lat(j)})"
        }
      }.mkString(",\n")
      val w32 = (v: String) =>
        s"(((($v) + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648)"
      s"""WITH e(pid, x0, y0, x1, y1, x2, y2) AS (VALUES
         |$rows)
         |SELECT CAST(pid AS BIGINT) AS pid, COUNT(*) AS n_vertices,
         |  CAST(ABS(SUM(CAST(x1 - x0 AS BIGINT) * (y2 - y0)
         |    - CAST(x2 - x0 AS BIGINT) * (y1 - y0))) AS BIGINT) AS area2,
         |  CASE WHEN SUM(${w32(w32("CAST(x2 AS BIGINT) - x1") + " * " + w32("CAST(y2 AS BIGINT) + y1"))}) >= 0
         |    THEN 'cw' ELSE 'ccw' END AS orient
         |FROM e GROUP BY pid ORDER BY pid""".stripMargin
    }) { (s, dir) => polyArea(Pip.polyDf(s, Pip.manyPolygons)) },

    // tile pyramid (see tilePyramid): engine = base agg + ancestor-explode
    // rollup; oracle = one direct GROUP BY per level from the raw rows
    QueryDef.sql("g_tile_pyramid", {
      val levels = (0 to PyrZMax).map { z =>
        val dx = 1L << (32 - z); val dy = 1L << (31 - z)
        s"""SELECT CAST($z AS BIGINT) AS z, x // $dx AS cx, y // $dy AS cy,
           |  COUNT(*) AS cnt, CAST(SUM(pxl) AS BIGINT) AS px,
           |  MIN(image_id) AS first_img FROM p GROUP BY 2, 3""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH p AS (SELECT image_id, CAST(lon AS BIGINT) + 1800000000 AS x,
         |    CAST(lat AS BIGINT) + 900000000 AS y,
         |    CAST(w AS BIGINT) * h AS pxl $fromImg)
         |SELECT z, cx, cy, cnt, px, first_img FROM ($levels) t
         |ORDER BY z, cx, cy""".stripMargin
    }) { (s, dir) => tilePyramid(img(s, dir)) },

    // lineage-manifest gate: do a real checkpointed tiled write
    // (TileLineage.writeTiled — skipping already-manifested tiles, commit
    // point = the manifest line) and gate THE MANIFEST'S OWN RECORDS — per
    // tile row count and lon/lat range — against an independent DuckDB
    // recomputation of the first-match assignment. The digest column is
    // xxhash64-based (not oracle-replayable) and is audited separately by
    // LineageSpec / TileLineage.audit. Re-runs hit the already-manifested
    // path, so the gate also exercises the idempotent resume.
    QueryDef.sql("g_lineage",
      s"""SELECT tile, COUNT(*) AS n_rows,
         |  CAST(MIN(lon) AS BIGINT) AS min_lon, CAST(MAX(lon) AS BIGINT) AS max_lon,
         |  CAST(MIN(lat) AS BIGINT) AS min_lat, CAST(MAX(lat) AS BIGINT) AS max_lat
         |FROM (SELECT CAST(($duckTile) AS BIGINT) AS tile, lon, lat $fromImg) t
         |GROUP BY tile ORDER BY tile""".stripMargin) { (s, dir) =>
      import s.implicits._
      val src = java.nio.file.Paths.get(dir, "documents.parquet")
      val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_lineage_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + stamp).toString
      val df = img(s, dir).select(col("image_id"), tileCol.as("tile"),
        col("lon"), col("lat"))
      graft.lineage.TileLineage.writeTiled(df, root)
      graft.lineage.TileLineage.readManifest(root)
        .map(m => (m.tile, m.rows, m.minLon, m.maxLon, m.minLat, m.maxLat))
        .toDF("tile", "n_rows", "min_lon", "max_lon", "min_lat", "max_lat")
        .orderBy("tile")
    }
  )
}
