package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Structured Streaming surface: the same tumbling-window aggregation as the
  * batch path, but executed as a real streaming query (file source ->
  * watermark -> windowed agg -> memory sink, drained synchronously). The
  * DuckDB oracle is the batch-equivalent SQL — streaming and batch must
  * agree on a bounded input.
  */
object StreamQueries {

  @volatile private var counter = 0

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("s_stream_window",
      s"""SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws, event_type, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val name = { counter += 1; s"graft_stream_out_$counter" }
      // the file stream source wants a directory; stage the single parquet
      val staged = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_stream_in_${dir.hashCode.toHexString}")
      java.nio.file.Files.createDirectories(staged)
      val target = staged.resolve("events.parquet")
      if (!java.nio.file.Files.exists(target))
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), target)
      val q = s.readStream.schema(schema).parquet(staged.toString)
        .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ (session is UTC)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      val out = s.table(name).orderBy("ws", "event_type")
      val materialized = out.cache()
      materialized.count() // pin results before stopping the stream
      q.stop()
      materialized
    }
  )
}
