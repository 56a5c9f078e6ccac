package graft

import org.apache.spark.sql.functions._

/** Dev profiling main: isolates the cost layers of the flagship path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "200").toInt
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import sources.ImageTable

    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(64)
      .select(col("doc_id"), col("text"), col("lang"))
    val exploded = docs.withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
      .withColumn("image_id", concat(lit("img"), col("doc_id"), lit("_"), col("rep")))
    t("explode only")(exploded.select(col("image_id")))
    val phash = exploded.withColumn("phash", ImageTable.h60(concat(lit("p:"), col("image_id"))))
    t("+ phash (1x md5)")(phash.select(col("phash")))
    val geo = phash
      .withColumn("lon", (ImageTable.h60(concat(lit("lon:"), col("image_id"), lit(":"), col("phash"))) % 3600000001L - 1800000000L).cast("int"))
      .withColumn("lat", (ImageTable.h60(concat(lit("lat:"), col("image_id"), lit(":"), col("phash"))) % 1800000001L - 900000000L).cast("int"))
    t("+ lon/lat (3x md5)")(geo.select(col("lon"), col("lat")))
    t("+ tile expr")(geo.select(operators.GeoQueries.tileCol.as("tile")))
    t("+ groupBy(tile)")(geo.select(operators.GeoQueries.tileCol.as("tile"))
      .groupBy("tile").agg(count(lit(1))))
    t("full ImageTable.df")(ImageTable.df(spark, sfDir, mult, preParts = 64)
      .select(operators.GeoQueries.tileCol.as("tile")).groupBy("tile").agg(count(lit(1))))
    spark.stop()
  }
}
