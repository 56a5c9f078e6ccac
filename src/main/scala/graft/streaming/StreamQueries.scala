package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.QueryDef

/** Structured Streaming surface, each operator executed as a REAL streaming
  * query (file source -> transform -> memory sink, drained synchronously)
  * and gated against the batch-equivalent DuckDB SQL — streaming and batch
  * must agree on a bounded input:
  *
  *  - s_stream_window: watermark + tumbling-window aggregation
  *  - s_stream_dedup:  streaming deduplication (dropDuplicates state store)
  *  - s_stream_state:  custom per-key state via flatMapGroupsWithState
  *    (running count / max per user; snapshots are monotone, so the final
  *    state is recovered deterministically with max() over the update log
  *    regardless of micro-batch boundaries)
  */
object StreamQueries {

  @volatile private var counter = 0

  /** Stage the single parquet into a directory (the file stream source
    * wants a directory) and return a started-memory-sink drain helper. */
  private def staged(dir: String, table: String): String = {
    // keyed by full sanitized path + source mtime+size (not hashCode):
    // distinct dirs never collide and a changed source re-stages
    val src = java.nio.file.Paths.get(dir, s"$table.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_in_${(dir + "_" + table).replaceAll("[^A-Za-z0-9]", "_")}_$stamp")
    java.nio.file.Files.createDirectories(p)
    val target = p.resolve(s"$table.parquet")
    if (!java.nio.file.Files.exists(target))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/$table.parquet"), target)
    p.toString
  }

  /** Run `build` as a streaming query into a memory sink, drain it, and
    * return the pinned result of `finish` over the sink table. */
  private def drain(s: SparkSession, mode: String)(build: String => org.apache.spark.sql.streaming.DataStreamWriter[_])
                   (finish: DataFrame => DataFrame): DataFrame = {
    val name = synchronized { counter += 1; s"graft_stream_out_$counter" }
    val q = build(name).outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    val out = finish(s.table(name)).cache()
    out.count() // pin results before stopping the stream
    q.stop()
    out
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("s_stream_window",
      s"""SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws, event_type, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      drain(s, "complete") { _ =>
        s.readStream.schema(schema).parquet(staged(dir, "events"))
          .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ (session is UTC)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "5 minutes").getField("start").as("ws"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream
      }(_.orderBy("ws", "event_type"))
    },

    // streaming deduplication: the dropDuplicates state store emits each
    // (user_id, event_type) pair once; the result SET is deterministic
    // (batch DISTINCT) even though which physical row is kept is not
    QueryDef.sql("s_stream_dedup",
      s"""SELECT DISTINCT user_id, event_type FROM events
         |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      drain(s, "append") { _ =>
        s.readStream.schema(schema).parquet(staged(dir, "events"))
          .select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type")
          .writeStream
      }(_.orderBy("user_id", "event_type"))
    },

    // custom keyed state: running (count, max event id) per user via
    // flatMapGroupsWithState in Update mode; every emitted snapshot is
    // monotone in both fields, so max() over the update log equals the
    // final state no matter how the source is micro-batched
    QueryDef.sql("s_stream_state",
      s"""SELECT user_id, COUNT(*) AS n, MAX(event_id) AS max_event_id
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      drain(s, "update") { _ =>
        s.readStream.schema(schema).parquet(staged(dir, "events"))
          .select(col("user_id"), col("event_id"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
            OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
            var (n, mx) = state.getOption.getOrElse((0L, Long.MinValue))
            rows.foreach { case (_, eid) => n += 1; mx = math.max(mx, eid) }
            state.update((n, mx))
            Iterator((uid, n, mx))
          }
          .toDF("user_id", "n", "max_event_id")
          .writeStream
      }(_.groupBy("user_id")
        .agg(max("n").as("n"), max("max_event_id").as("max_event_id"))
        .orderBy("user_id"))
    },

    // stream-stream inner join with watermarks on both sides and a
    // time-range condition (views followed by a click within 10 minutes,
    // per user) — the join-state operator of the streaming surface. The
    // range condition is what lets the state store evict; on this bounded
    // input nothing is late, so the result equals the batch join exactly.
    QueryDef.sql("s_stream_join",
      s"""SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
         |  CAST(MIN(c.event_id) AS BIGINT) AS first_click,
         |  CAST(MAX(v.event_id) AS BIGINT) AS last_view
         |FROM events v JOIN events c
         |  ON c.user_id = v.user_id AND v.event_type = 'view' AND c.event_type = 'click'
         |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
         |GROUP BY v.user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      drain(s, "append") { _ =>
        def src = s.readStream.schema(schema).parquet(staged(dir, "events"))
          .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ (session is UTC)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
          .withWatermark("v_ts", "10 minutes")
        val clicks = src.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "10 minutes")
        views.join(clicks,
            col("c_user") === col("v_user") &&
              col("c_ts") >= col("v_ts") &&
              col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
          .writeStream
      }(_.groupBy(col("v_user"))
        .agg(count(lit(1)).as("n_pairs"),
          min("click_id").as("first_click"), max("view_id").as("last_view"))
        .select(col("v_user").as("user_id"), col("n_pairs"),
          col("first_click"), col("last_view"))
        .orderBy("user_id"))
    },

    // streaming tile assignment: the image-row derivation + the NATIVE
    // codegen first-match tile expression (plans.TileId) running inside
    // Structured Streaming micro-batches, aggregated per tile in complete
    // mode — the geospatial core and the streaming surface composed. The
    // oracle is the same batch derivation + first-match SQL the g_tile_*
    // gates replay; streaming and batch must agree on the bounded input.
    QueryDef.sql("s_stream_tile",
      s"""SELECT tile, COUNT(*) AS n FROM
         |  (SELECT CAST((${graft.operators.GeoQueries.duckTile}) AS BIGINT) AS tile
         |   FROM ${graft.sources.ImageTable.duckSql()}) t
         |GROUP BY tile ORDER BY tile""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      drain(s, "complete") { _ =>
        graft.sources.ImageTable.derive(
            s.readStream.schema(schema).parquet(staged(dir, "documents"))
              .select(col("doc_id"), col("text"), col("lang")), mult = 1)
          .select(graft.operators.GeoQueries.tileCol.as("tile"))
          .groupBy("tile").agg(count(lit(1)).as("n"))
          .writeStream
      }(_.orderBy("tile"))
    },

    // streaming geofence: the codegen point-in-polygon mask running inside
    // micro-batches, per-mask populations in complete mode — the second
    // geo-core x streaming composition (tile assignment above).
    QueryDef.sql("s_stream_pip",
      s"""WITH ${graft.sources.ImageTable.duckCte()}
         |SELECT mask, COUNT(*) AS n
         |FROM ${graft.operators.Pip.maskDuckSql()} m
         |GROUP BY mask ORDER BY mask""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      drain(s, "complete") { _ =>
        graft.sources.ImageTable.derive(
            s.readStream.schema(schema).parquet(staged(dir, "documents"))
              .select(col("doc_id"), col("text"), col("lang")), mult = 1)
          .select(graft.operators.Pip.mask(col("lon"), col("lat"),
            graft.operators.Pip.fixtureSet).as("mask"))
          .groupBy("mask").agg(count(lit(1)).as("n"))
          .writeStream
      }(_.orderBy("mask"))
    },

    // streaming INCREMENTAL dedup: the batch-vs-corpus near-dup screen
    // (d_incr_dedup) running inside micro-batches — per-row minhash
    // signatures as pure column ops (min over the word multiset = min over
    // the set, so no DISTINCT/groupBy is needed before the join), band
    // explode, stream-STATIC equi-join against the precomputed corpus band
    // index, exact-Jaccard confirm on carried word sets; the one streaming
    // aggregation is the final per-doc summary (collect_set stands in for
    // the distinct aggregate streaming disallows). This is the ingestion
    // shape: the corpus index is the static build side, each arriving doc
    // is screened without touching corpus text.
    QueryDef.sql("s_stream_incr_dedup",
      graft.operators.DocQueries.incrScreenOracleSql(
        "SELECT doc_id + 30000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0") +
        """
          |SELECT nid AS new_id, COUNT(*) AS n_matches, MIN(oid) AS keeper
          |FROM conf GROUP BY nid ORDER BY new_id""".stripMargin) { (s, dir) =>
      val (bandIdx, wordSets) = graft.operators.DocQueries.corpusBandIndex(s, dir)
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      drain(s, "complete") { _ =>
        graft.operators.DocQueries.incrScreen(
            s.readStream.schema(schema).parquet(staged(dir, "documents"))
              .filter(col("doc_id") % 3 === 0)
              .withColumn("doc_id", col("doc_id") + 30000000L)
              .select("doc_id", "text"),
            bandIdx, wordSets)
          .writeStream
      }(_.orderBy("new_id"))
    }
  )
}
