package graft

import org.apache.spark.sql.functions._

/** Dev experiment: where does 8->32 scaling go? Pure-compute probe vs the
  * real tile_assign stage, various partition counts.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val mult = 5000
    for (cpus <- Seq("8", "32")) {
      val spark = Bench.session(cpus)
      import spark.implicits._
      // (a) pure codegen compute, no shuffle input: spark.range
      val n = 25000000L
      val pure = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
        .select(conv(substring(md5(concat(lit("x"), col("id"))), 1, 15), 16, 10).cast("long").as("h"))
        .select(sum(col("h") % 1000000))
      val tPure = Bench.timeIt(pure.toDF())
      // (b) the real image derivation + tile, 4x partitions
      val img = sources.ImageTable.df(spark, sfDir, mult,
        preParts = spark.sparkContext.defaultParallelism * 4)
      val real = img.select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)))
      val tReal = Bench.timeIt(real)
      println(s"RESULT cpus=$cpus pure=${tPure}s real=${tReal}s")
      spark.stop()
    }
  }
}
