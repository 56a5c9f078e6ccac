package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev main: dump the formatted physical plan of the headline kNN. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("8")
    val img = sources.ImageTable.df(spark, "/root/testdata/sf0.01", 10,
      preParts = 8).persist(StorageLevel.MEMORY_AND_DISK)
    val n = img.count()
    val pts = img.select(xxhash64(col("image_id")).as("id"), col("lon"), col("lat"))
    val qs = pts.filter(pmod(col("id"), lit(200)) === 0)
    val df = operators.Knn(pts, qs, 3, operators.Knn.adaptiveCellSize(n, 3))
    df.explain("formatted")
    // execute, then dump the FINAL adaptive plan: AQE stage reuse
    // (ReusedQueryStage / ReusedExchange) only shows post-execution
    df.write.format("noop").mode("overwrite").save()
    val fin = df.queryExecution.executedPlan.toString
    println("=== post-execution adaptive plan ===")
    println(fin.linesIterator.filter(l =>
      l.contains("Reused") || l.contains("Exchange") || l.contains("ObjectHashAggregate") ||
        l.contains("QueryStage")).mkString("\n"))
    spark.stop()
  }
}
