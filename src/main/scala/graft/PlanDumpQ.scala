package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev main: dump `.explain("formatted")` for every bench entry (headline +
  * extras, mirroring Bench.main's construction) to plans/<outdir>/<name>_<suffix>.txt.
  * Usage: runMain graft.PlanDumpQ <suffix> [entry,entry,...]
  */
object PlanDumpQ {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val only: String => Boolean =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else _ => true
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "200").toInt
    val spark = Bench.session(cpus)
    val outDir = java.nio.file.Paths.get("plans", "r06")
    java.nio.file.Files.createDirectories(outDir)

    val preParts = spark.sparkContext.defaultParallelism * 2
    val img = sources.ImageTable.df(spark, sfDir, mult, preParts = preParts)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRows = img.count()

    def events10x = {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(9))))
        .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
        .withColumn("event_id", col("event_id") + col("rep") * 1000000000L)
        .drop("rep")
      ev
    }
    val extra: Seq[(String, () => DataFrame)] = Seq(
      "asof_1m" -> (() => operators.RelationalQueries.asofJoin(events10x)),
      "range_join_1m" -> (() => operators.RelationalQueries.rangeJoin(events10x)),
      "dup_groups" -> (() => operators.DocQueries.defs.find(_.name == "d_dup_groups").get
        .fn(spark, sfDir)),
      "dist_join_1m" -> (() => operators.GeoQueries.distJoin(img, 1000000L)),
      "pip_join_96" -> (() => operators.Pip.pipJoin(
        img.select(col("image_id"), col("lon"), col("lat")),
        operators.Pip.polyDf(spark, operators.Pip.manyPolygons),
        operators.Pip.ManyCellSide)),
      "pip_join_10k" -> (() => operators.Pip.pipJoin(
        img.select(col("image_id"), col("lon"), col("lat")),
        operators.Pip.polyDf(spark, operators.Pip.benchPolygons),
        operators.Pip.BenchCellSide)
        .groupBy("pid").agg(count(lit(1)).as("n"))),
      "tile_pyramid_1m" -> (() => operators.GeoQueries.tilePyramid(img)),
      "kmeans_200k" -> (() => operators.EmbedQueries.kmeansScaled(spark, sfDir, 100)),
      "span_dup_100k" -> (() => operators.DocQueries.spanDup(
        spark.read.parquet(s"$sfDir/documents.parquet").repartition(64)
          .withColumn("rep", explode(sequence(lit(0), lit(19))))
          .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L)
          .select("doc_id", "text"))))

    val all = Bench.headline(spark, sfDir, img, nRows) ++ extra
    all.filter(e => only(e._1)).foreach { case (name, mk) =>
      try {
        val df = mk()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        core.Caching.freeLocalCheckpoints(df)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
