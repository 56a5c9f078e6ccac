package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime evidence for the AQE behaviors the engine relies on at scale
  * (adaptive plans only materialize after execution, so PlanSpec's static
  * explain cannot show them): shuffle-partition coalescing on small
  * post-shuffle data, and skew-join splitting of a hot-key partition.
  */
class AqeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("aqe-spec")
    .config("spark.sql.shuffle.partitions", "200")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // thresholds scaled down so the sf0.001-sized fixtures exhibit the
    // same runtime decisions a 100 TB job sees at production defaults
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("AQE coalesces the 200 configured shuffle partitions on small data") {
    val df = sources.ImageTable.df(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead"), plan)
    assert(plan.contains("coalesced"), plan)
    // the tiny aggregate must not execute with 200 post-shuffle tasks
    val parts = df.rdd.getNumPartitions
    assert(parts < 20, s"expected coalesced partitions, got $parts")
  }

  test("AQE splits the hot-key partition in a skewed join") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // one metro tile holds ~97% of rows — the dense-metro shape the
      // salted aggregation handles on the agg side; on the join side AQE
      // must split the hot partition instead
      val facts = spark.range(300000)
        .select((when(col("id") % 30 === 0, col("id") % 40).otherwise(lit(7L))).as("tile"),
          col("id").as("v"), md5(col("id").cast("string")).as("pad"))
      val dims = spark.range(40).select(col("id").as("tile"), (col("id") * 10).as("w"))
      // NOTE: aggregating BY the join key would reuse the join's hash
      // partitioning, and AQE refuses to split skew when the split would
      // force an extra downstream shuffle — so reduce to a global sum
      val joined = facts.join(dims, Seq("tile")).agg(sum(col("v") + col("w")).as("sv"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
