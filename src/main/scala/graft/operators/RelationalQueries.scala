package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.core.PortableHash
import graft.sources.ImageTable

/** The relational operator layer (SURVEY.md §2.3-2.7): joins (incl. the
  * reference's node-location join J1 and membership backlink join J4 as
  * TPC-H-shaped analogs), aggregations, windows, set ops, semi/anti joins,
  * JSON extraction and time-window aggregation. Monetary sums are computed
  * in integer cents so the oracle matches exactly.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** exact cents: CAST(round(x*100) AS BIGINT), identical in both engines */
  private def cents(c: String) = s"CAST(round($c * 100) AS BIGINT)"

  /** q_sessionize inactivity gap: 6 h in epoch milliseconds. */
  val SessionGapMs = 21600000L

  /** The reference's 49 discardable tag keys (ElementWithID.java:27-79). */
  val DiscardableKeys: Seq[String] = Seq(
    "created_by", "converted_by", "geobase:datasetName", "geobase:uuid",
    "gnis:import_uuid", "import_uuid", "KSJ2:ADS", "KSJ2:ARE", "KSJ2:AdminArea",
    "KSJ2:COP_label", "KSJ2:DFD", "KSJ2:INT", "KSJ2:INT_label", "KSJ2:LOC",
    "KSJ2:LPN", "KSJ2:OPC", "KSJ2:PubFacAdmin", "KSJ2:RAC", "KSJ2:RAC_label",
    "KSJ2:RIC", "KSJ2:RIN", "KSJ2:WSC", "KSJ2:coordinate", "KSJ2:curve_id",
    "KSJ2:curve_type", "KSJ2:filename", "KSJ2:lake_id", "KSJ2:lat", "KSJ2:long",
    "KSJ2:river_id", "odbl", "odbl:note", "osmarender:nameDirection",
    "osmarender:renderName", "osmarender:renderRef", "osmarender:rendernames",
    "SK53_bulk:load", "sub_sea:type", "tiger:upload_uuid", "tiger:tlid",
    "tiger:source", "tiger:separated", "yh:LINE_NAME", "yh:LINE_NUM",
    "yh:STRUCTURE", "yh:TOTYUMONO", "yh:TYPE", "yh:WIDTH", "yh:WIDTH_RANK")

  // a derived "tag key" per lineitem: a mix of discardable and real keys
  private val KeyPool: Seq[String] = Seq(
    "highway", "created_by", "amenity", "odbl", "natural", "tiger:tlid",
    "building", "KSJ2:LOC", "power", "source")

  /** As-of join over any events-shaped frame (event_id, user_id, ts,
    * event_type): each click matched to the latest prior-or-equal view by
    * the same user — join-free, one union + window pass (single shuffle on
    * user_id). Exposed for the bench's scaled runs. */
  def asofJoin(ev: DataFrame): DataFrame = {
    val e = ev
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "view").cast("int").as("is_view"))
    // views order before clicks at equal ts so an equal-ts view is visible
    // to the click; among equal-ts views the largest event_id wins (last).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_view").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("asof_view_id",
        last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("asof_view_ts",
        last(when(col("is_view") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_view") === 0)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"),
        coalesce(col("asof_view_id"), lit(-1L)).as("asof_view_id"),
        coalesce(col("asof_view_ts"), lit("1970-01-01 00:00:00").cast("timestamp")).as("asof_view_ts"))
  }

  /** Bucketed interval join over any events-shaped frame: clicks landing
    * in each error's 5-minute half-open window, per user — a shuffle
    * EQUI-join on (user, 300s bucket) with an exact range refine. */
  def rangeJoin(ev: DataFrame): DataFrame = {
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"),
        floor(unix_timestamp(col("ts")) / 300).as("b0"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        floor(unix_timestamp(col("ts")) / 300).as("bucket"))
    // [t, t+300s) spans buckets b0 and b0+1 exactly
    val cand = errs
      .withColumn("ebucket", explode(array(col("b0"), col("b0") + 1)))
      .join(clicks, col("c_user") === col("user_id") && col("bucket") === col("ebucket"))
      .filter(col("c_ts") >= col("err_ts") &&
        col("c_ts") < col("err_ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy("err_id").agg(count(lit(1)).as("n"))
    errs.join(cand, Seq("err_id"), "left")
      .select(col("err_id"), col("user_id"), coalesce(col("n"), lit(0L)).as("n_clicks"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS sum_price_c,
         |  CAST(SUM(${cents("l_extendedprice")} * (100 - ${cents("l_discount")})) AS BIGINT) AS sum_disc_c,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(expr(cents("l_extendedprice"))).as("sum_price_c"),
          sum(expr(cents("l_extendedprice")) * (lit(100) - expr(cents("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // multi-way join with a broadcast dim: revenue by nation
    QueryDef.sql("q_join_pricing",
      s"""SELECT n.n_name AS nation,
         |  CAST(SUM(${cents("l.l_extendedprice")} * (100 - ${cents("l.l_discount")})) AS BIGINT) AS revenue_c,
         |  COUNT(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY n.n_name ORDER BY nation""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(
          sum(expr(cents("l_extendedprice")) * (lit(100) - expr(cents("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy("nation")
    },

    QueryDef.sql("q_window_topk",
      s"""SELECT l_suppkey, CAST(rk AS BIGINT) AS rk, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
         |FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
         |        row_number() OVER (PARTITION BY l_suppkey
         |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
         |      FROM lineitem) t
         |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("rk").cast("long").as("rk"),
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
        .orderBy("l_suppkey", "rk")
    },

    QueryDef.sql("q_semi_anti",
      s"""SELECT
         |  (SELECT COUNT(*) FROM customer c WHERE EXISTS
         |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
         |  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
         |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      val semi = c.join(o, Seq("c_custkey"), "left_semi").count()
      val anti = c.join(o, Seq("c_custkey"), "left_anti").count()
      import s.implicits._
      Seq((semi, anti)).toDF("with_orders", "without_orders")
    },

    QueryDef.sql("q_setops",
      s"""WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'),
         |b AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000)
         |SELECT
         |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b) u) AS n_union,
         |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) i) AS n_intersect,
         |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) e) AS n_except""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select("o_orderkey")
      val b = o.filter(col("o_totalprice") > 100000).select("o_orderkey")
      import s.implicits._
      Seq((a.union(b).distinct.count(), a.intersect(b).count(), a.except(b).count()))
        .toDF("n_union", "n_intersect", "n_except")
    },

    // tumbling 5-minute window aggregation (streaming-shaped, run in batch)
    QueryDef.sql("q_events_window",
      s"""SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws, event_type,
         |  COUNT(*) AS n, CAST(SUM(${cents("value")}) AS BIGINT) AS sum_c
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(expr(cents("value"))).as("sum_c"))
        .orderBy("ws", "event_type")
    },

    QueryDef.sql("q_events_json",
      s"""SELECT event_type,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         |  COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // gap-based sessionization: a new session starts when a user's
    // inter-event gap exceeds 6 h. One window (lag + running sum) partitioned
    // by user_id — every user sessionizes independently, so the operator
    // parallelizes to any user count; no global sort, no driver state. The
    // per-user ORDER BY (t, event_id) is a total order (event_id unique),
    // so the session numbering is deterministic on both engines.
    QueryDef.sql("q_sessionize",
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t FROM events),
         |m AS (SELECT user_id, event_id, t,
         |        CASE WHEN COALESCE(t - lag(t) OVER w, ${SessionGapMs + 1}) > $SessionGapMs
         |             THEN 1 ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         |x AS (SELECT user_id, t,
         |        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id) AS BIGINT) AS sess
         |      FROM m)
         |SELECT user_id, sess, COUNT(*) AS n_events, MIN(t) AS t_start, MAX(t) AS t_end
         |FROM x GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      t(s, dir, "events")
        // ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the LTZ cast
        // is the identity reinterpretation and unix_millis == DuckDB epoch_ms
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts").cast("timestamp")).as("t"))
        .withColumn("brk",
          when(coalesce(col("t") - lag("t", 1).over(w), lit(SessionGapMs + 1)) > SessionGapMs,
            lit(1L)).otherwise(lit(0L)))
        .withColumn("sess", sum("brk").over(w))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"), min("t").as("t_start"), max("t").as("t_end"))
        .orderBy("user_id", "sess")
    },

    // J1 analog — node-location join: "ways" (lineitem refs in linenumber
    // order) resolve "node" coordinates (part-derived); unresolved refs
    // (1-in-7 parts withheld) are the MAX_VALUE-sentinel path
    QueryDef.sql("o_node_join", {
      val lonSql = s"CAST(${PortableHash.duckSql("('nlon:' || CAST(p_partkey AS VARCHAR))")} % 3600000001 - 1800000000 AS BIGINT)"
      val latSql = s"CAST(${PortableHash.duckSql("('nlat:' || CAST(p_partkey AS VARCHAR))")} % 1800000001 - 900000000 AS BIGINT)"
      s"""WITH nodes AS (SELECT p_partkey, $lonSql AS lon, $latSql AS lat
         |              FROM part WHERE p_partkey % 7 <> 0)
         |SELECT l.l_orderkey AS way_id, COUNT(*) AS n_refs,
         |  COUNT(*) - COUNT(n.lon) AS n_missing,
         |  CAST(COALESCE(SUM(n.lon), 0) AS BIGINT) AS sum_lon,
         |  CAST(COALESCE(SUM(n.lat), 0) AS BIGINT) AS sum_lat
         |FROM lineitem l LEFT JOIN nodes n ON n.p_partkey = l.l_partkey
         |GROUP BY l.l_orderkey ORDER BY way_id""".stripMargin
    }) { (s, dir) =>
      val nodes = t(s, dir, "part").filter(col("p_partkey") % 7 =!= 0)
        .select(col("p_partkey"),
          (ImageTable.h60(concat(lit("nlon:"), col("p_partkey"))) % 3600000001L - 1800000000L).as("lon"),
          (ImageTable.h60(concat(lit("nlat:"), col("p_partkey"))) % 1800000001L - 900000000L).as("lat"))
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(nodes, col("l_partkey") === col("p_partkey"), "left")
        .groupBy(col("l_orderkey").as("way_id"))
        .agg(count(lit(1)).as("n_refs"),
          (count(lit(1)) - count(col("lon"))).as("n_missing"),
          coalesce(sum("lon"), lit(0L)).as("sum_lon"),
          coalesce(sum("lat"), lit(0L)).as("sum_lat"))
        .orderBy("way_id")
    },

    // J4 analog — membership backlink join: collect per-element reverse
    // membership links (rel id, position) and attach via left outer join;
    // unreferenced low-p_size elements are dropped (the P2 untagged-drop)
    QueryDef.sql("o_backlink", {
      val mh = PortableHash.duckSql("(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))")
      s"""WITH links AS (
         |  SELECT l_partkey, COUNT(*) AS n_members, CAST(bit_xor($mh) AS BIGINT) AS link_xor
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT p.p_partkey, COALESCE(n_members, 0) AS n_members,
         |  COALESCE(link_xor, 0) AS link_xor
         |FROM part p LEFT JOIN links ON links.l_partkey = p.p_partkey
         |WHERE n_members IS NOT NULL OR p.p_size >= 10
         |ORDER BY p_partkey""".stripMargin
    }) { (s, dir) =>
      val mh = PortableHash.sparkSql("(CAST(l_orderkey AS STRING) || ':' || CAST(l_linenumber AS STRING))")
      val links = t(s, dir, "lineitem")
        .select(col("l_partkey"), expr(mh).as("mh"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_members"), expr("bit_xor(mh)").as("link_xor"))
      t(s, dir, "part").join(links, col("p_partkey") === col("l_partkey"), "left")
        .filter(col("n_members").isNotNull || col("p_size") >= 10)
        .select(col("p_partkey"),
          coalesce(col("n_members"), lit(0L)).as("n_members"),
          coalesce(col("link_xor"), lit(0L)).as("link_xor"))
        .orderBy("p_partkey")
    },

    // P4 analog — the relation three-way split by type tag
    QueryDef.sql("o_rel_split",
      s"""SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'restriction'
         |            WHEN o_orderpriority = '2-HIGH' THEN 'multipolygon'
         |            ELSE 'collection' END AS kind,
         |  COUNT(*) AS n, CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS total_c
         |FROM orders GROUP BY 1 ORDER BY kind""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("kind",
          when(col("o_orderpriority") === "1-URGENT", "restriction")
            .when(col("o_orderpriority") === "2-HIGH", "multipolygon")
            .otherwise("collection"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), sum(expr(cents("o_totalprice"))).as("total_c"))
        .orderBy("kind")
    },

    // hierarchical totals via ROLLUP (sentinel-coalesced so both engines
    // order and hash identically — no NULL-order divergence)
    // pivot: per-language counts spread over the fmt domain as columns
    // (Spark relational pivot vs a CASE-aggregation oracle; the pivoted
    // value list is fixed and known, so no collect-the-domain pass runs)
    QueryDef.sql("q_pivot",
      s"""SELECT lang,
         |  COUNT(CASE WHEN fmt = 'raw' THEN 1 END) AS raw,
         |  COUNT(CASE WHEN fmt = 'qrle' THEN 1 END) AS qrle,
         |  CAST(SUM(CASE WHEN fmt = 'raw' THEN w END) AS BIGINT) AS raw_w,
         |  CAST(SUM(CASE WHEN fmt = 'qrle' THEN w END) AS BIGINT) AS qrle_w
         |FROM ${graft.sources.ImageTable.duckSql()}
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      graft.sources.ImageTable.df(s, dir)
        .groupBy("lang").pivot("fmt", Seq("raw", "qrle"))
        .agg(count(lit(1)).as("n"), sum(col("w").cast("long")).as("w"))
        .select(col("lang"),
          coalesce(col("raw_n"), lit(0L)).as("raw"),
          coalesce(col("qrle_n"), lit(0L)).as("qrle"),
          col("raw_w"), col("qrle_w"))
        .orderBy("lang")
    },

    QueryDef.sql("q_rollup",
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS f, COALESCE(l_linestatus, 'ALL') AS st,
         |  COUNT(*) AS n, CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS sum_c
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY f, st""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(expr(cents("l_extendedprice"))).as("sum_c"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("f"),
          coalesce(col("l_linestatus"), lit("ALL")).as("st"), col("n"), col("sum_c"))
        .orderBy("f", "st")
    },

    // As-of join: each click is matched to the latest prior-or-equal view
    // by the same user. Spark-side this is NOT a join at all — the scalable
    // shape is one union + one window pass (single shuffle on user_id,
    // O(n log n) within partitions): views and clicks interleave in time
    // order and `last(view, ignoreNulls)` carries the running most-recent
    // view forward. The oracle is the naive O(n*m) inequality join + rank,
    // so engine and oracle share no algorithm. Ties at equal ts resolve
    // view-before-click, then by greatest view event_id; no-match clicks
    // carry -1 / epoch sentinels (hash-stable, no NULL divergence).
    QueryDef.sql("q_asof",
      s"""WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
         |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         |j AS (SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
         |        v.event_id AS view_id, v.ts AS view_ts,
         |        row_number() OVER (PARTITION BY c.event_id
         |          ORDER BY v.ts DESC, v.event_id DESC) AS rk
         |      FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.ts <= c.ts)
         |SELECT click_id, user_id, click_ts,
         |  COALESCE(view_id, -1) AS asof_view_id,
         |  COALESCE(view_ts, TIMESTAMP '1970-01-01 00:00:00') AS asof_view_ts
         |FROM j WHERE rk = 1 ORDER BY click_id""".stripMargin) { (s, dir) =>
      asofJoin(t(s, dir, "events")).orderBy("click_id")
    },

    // Range (interval) join: clicks landing in each error's 5-minute
    // half-open window [ts, ts+5min), per user. The scalable shape: both
    // sides key on coarse 300-second buckets — each error interval covers
    // exactly two buckets (exploded), each click exactly one — so the
    // candidate join is a shuffle EQUI-join on (user_id, bucket) with the
    // exact range predicate as a post-filter, never a cartesian/BNLJ
    // (asserted in PlanSpec). The oracle is the naive inequality join.
    QueryDef.sql("q_range_join",
      s"""WITH e AS (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error'),
         |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
         |SELECT e.err_id, e.user_id, COUNT(c.ts) AS n_clicks
         |FROM e LEFT JOIN c ON c.user_id = e.user_id
         |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 5 MINUTE
         |GROUP BY e.err_id, e.user_id ORDER BY err_id""".stripMargin) { (s, dir) =>
      rangeJoin(t(s, dir, "events")).orderBy("err_id")
    },

    // CUBE over (returnflag, ship year): all four grouping-set combinations
    // in one pass (sentinel-coalesced like q_rollup so ordering and hashes
    // agree across engines)
    QueryDef.sql("q_cube",
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS f,
         |  COALESCE(CAST(y AS VARCHAR), 'ALL') AS yr,
         |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |FROM (SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS y, l_quantity
         |      FROM lineitem) t
         |GROUP BY CUBE(l_returnflag, y)
         |ORDER BY f, yr""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), year(col("l_shipdate")).cast("long").as("y"), col("l_quantity"))
        .cube("l_returnflag", "y")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("f"),
          coalesce(col("y").cast("string"), lit("ALL")).as("yr"), col("n"), col("sum_qty"))
        .orderBy("f", "yr")
    },

    // P1 analog — the 49-key discardable-tag filter
    QueryDef.sql("o_tag_filter", {
      val pool = KeyPool.map(k => s"'$k'").mkString(", ")
      val disc = DiscardableKeys.map(k => s"'$k'").mkString(", ")
      s"""SELECT key, COUNT(*) AS n FROM (
         |  SELECT ([$pool])[CAST(l_suppkey % ${KeyPool.size} + 1 AS INTEGER)] AS key
         |  FROM lineitem) t
         |WHERE key NOT IN ($disc)
         |GROUP BY key ORDER BY key""".stripMargin
    }) { (s, dir) =>
      val pool = array(KeyPool.map(lit): _*)
      t(s, dir, "lineitem")
        .select(element_at(pool, (col("l_suppkey") % KeyPool.size + 1).cast("int")).as("key"))
        .filter(!col("key").isin(DiscardableKeys: _*))
        .groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy("key")
    }
  )
}
