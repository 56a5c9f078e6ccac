package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Headline benchmark (driver-run per round -> BENCH_r{N}.json): one JSON
  * line with per-query seconds plus rows/sec throughput for the flagship
  * tile-assignment + spatial-join path on a multiplied image table.
  */
object Bench {

  def session(cpus: String): SparkSession = {
    // SPARK_GRAFT_SHUFFLE pins the shuffle width independently of core
    // count: the two-cluster-size scaling runs use the SAME partition count
    // at local[8] and local[32] so the shuffle structure is identical and
    // only the executor parallelism varies (smaller tasks also balance
    // better under bursty hypervisor steal)
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def headline(s: SparkSession, sfDir: String, mult: Int): Seq[(String, DataFrame)] = {
    val parts = s.sparkContext.defaultParallelism * 2
    // repartition BEFORE the explode so the multiplied table parallelizes
    // (documents is a single parquet file = one input split otherwise)
    val imgCached = sources.ImageTable.df(s, sfDir, mult, preParts = parts)
    Seq(
      "tile_assign" -> imgCached
        .select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n")),
      "pip_join" -> imgCached
        .select(operators.Pip.mask(col("lon"), col("lat"), operators.Pip.fixtureSet).as("m"))
        .groupBy("m").agg(count(lit(1)).as("n")),
      "skew_agg" -> {
        val sk = sources.ImageTable.skewed(imgCached)
          .select(operators.GeoQueries.tileCol.as("tile"), col("phash"),
            pmod(xxhash64(col("image_id")), lit(16)).as("salt"))
        sk.groupBy("tile", "salt").agg(count(lit(1)).as("pc"), sum(col("phash") % 1000000).as("ps"))
          .groupBy("tile").agg(sum("pc").as("cnt"), sum("ps").as("s"))
      },
      "knn" -> {
        val pts = imgCached.select(
          xxhash64(col("image_id")).as("id"), col("lon"), col("lat"))
        val qs = pts.filter(pmod(col("id"), lit(200)) === 0)
        operators.Knn(pts, qs, k = 3, cellSize = 16000000L)
      },
      "minhash_lsh" -> operators.DocQueries.defs.find(_.name == "d_minhash_lsh").get
        .fn(s, sfDir).limit(1000000),
      // the bucket+multiprobe ANN join (the scale path) replaces the
      // round-1 brute-force topk_mips headline entry
      "ann_topk" -> operators.EmbedQueries.defs.find(_.name == "e_ann_topk").get
        .fn(s, sfDir),
      "cosine_dup" -> operators.EmbedQueries.defs.find(_.name == "e_cosine_dup").get
        .fn(s, sfDir),
      "join_pricing" -> operators.RelationalQueries.defs.find(_.name == "q_join_pricing").get
        .fn(s, sfDir)
    )
  }

  /** steady-state seconds: one warm-up execution, then the timed one. */
  def timeIt(df: DataFrame): Double = {
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // x200 = 1M rows at sf0.1: small-input fixed overhead dominated the
    // round-1 artifact at x20 (19k rows/s reported vs 471k steady-state)
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "200").toInt
    val spark = session(cpus)

    val qs = headline(spark, sfDir, mult)
    // warm up the flagship path once (JIT + codegen)
    qs.head._2.write.format("noop").mode("overwrite").save()

    val nRows = sources.ImageTable.df(spark, sfDir, mult).count()
    val results = qs.map { case (name, df) => name -> timeIt(df) }
    val tileSec = results.head._2
    val qJson = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir","image_rows":$nRows,"tile_assign_rows_per_sec":${(nRows / tileSec).toLong},"cpus":$cpus,"mult":$mult}""")
    spark.stop()
  }
}
