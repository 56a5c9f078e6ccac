package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-domain suites; every entry with a DuckDB
  * oracle participates in the row/schema/hash correctness gate.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    operators.GeoQueries.defs ++
      operators.DocQueries.defs ++
      operators.EmbedQueries.defs ++
      operators.RelationalQueries.defs ++
      operators.MultimodalQueries.defs ++
      operators.OmaQueries.defs ++
      operators.BinaryScanQueries.defs ++
      operators.BucketedQueries.defs ++
      streaming.StreamQueries.defs

  /** Flagship: first-match tile assignment + per-tile manifest counts on the
    * derived image+caption table (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val images = sources.ImageTable.df(spark, "/root/testdata/sf0.001")
    images
      .select(col("image_id"), operators.GeoQueries.tileCol.as("tile"))
      .groupBy("tile").agg(count(lit(1)).as("cnt"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
