package graft

import org.apache.spark.sql.functions._

/** Extreme-scale probe (one-off artifact, not the per-round bench): the
  * flagship derive → tile-assign → aggregate pipeline at 100x the headline
  * row count, UNPERSISTED — the 100 TB shape, where input never fits in
  * memory and every operator must stream. Reports rows/sec so the headline
  * bench's throughput claim can be checked for constancy under a 100x
  * scale-up (a fixed-capacity structure or driver-side accumulation would
  * show up here as a collapse or an OOM, not a constant).
  *
  * SPARK_GRAFT_MULT rows per source document (default 20000 -> 100M rows at
  * sf0.1), SPARK_GRAFT_CPUS cores (default 32).
  */
object BigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "20000").toInt
    val spark = Bench.session(cpus)

    def img = sources.ImageTable.df(spark, sfDir, mult,
      preParts = spark.sparkContext.defaultParallelism * 4)

    val jobs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "tile_assign" -> (() => img
        .select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n"))),
      "pip_mask" -> (() => img
        .select(operators.Pip.mask(col("lon"), col("lat"), operators.Pip.fixtureSet).as("m"))
        .groupBy("m").agg(count(lit(1)).as("n"))),
      "tile_pyramid" -> (() => operators.GeoQueries.tilePyramid(img)))

    val (s0, b0) = Bench.cpuTicks()
    val nRows = img.count()
    val results = jobs.map { case (name, mk) =>
      val sec = Bench.timeIt(mk()) // warm-up + timed execution
      val tput = (nRows / sec).toLong
      name -> (sec, tput)
    }
    val (s1, b1) = Bench.cpuTicks()
    val steal = if (b1 > b0) 100.0 * (s1 - s0) / (b1 - b0) else -1.0
    val qj = results.map { case (n, (sec, t)) =>
      s""""$n":{"sec":${f"$sec%.2f"},"rows_per_sec":$t}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"big_probe","rows":$nRows,"mult":$mult,"cpus":$cpus,"jobs":$qj,"steal_pct":${f"$steal%.2f"}}""")
    spark.stop()
  }
}
