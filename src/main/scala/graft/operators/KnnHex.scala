package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact kNN via iterative hex-ring expansion (the H3-style path the north
  * star names): points are bucketed into hex cells and broadcast; each query
  * expands rings 0, 1, 2, ... around its cell, keeping a running top-k, and
  * stops once the k-th distance is certified against the next ring's
  * geometric lower bound (points in cells at hex-distance d sit at least
  * d*sqrt(3)*R - 2R away). A final pass re-sorts the per-query candidate
  * set — the "secondary sort-merge pass".
  *
  * The broadcast-index shape fits queries >> points (ANN-lookup style). For
  * points >> memory the same cells become a shuffle key instead (the g_knn
  * operator is that co-partitioned variant on a square lattice).
  */
object KnnHex {

  def apply(points: DataFrame, queries: DataFrame, k: Int, res: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val pts = points.select(col("id").cast("long"), col("lon").cast("int"), col("lat").cast("int"))
      .as[(Long, Int, Int)].collect()
    val buckets: Map[(Int, Int), Array[(Long, Int, Int)]] =
      pts.groupBy(p => HexCells.cell(p._2, p._3, res))
    val bucketsB = spark.sparkContext.broadcast(buckets)
    val total = pts.length
    val r0 = HexCells.radius(res)
    val ringStep = math.sqrt(3.0) * r0

    queries.select(col("id").cast("long"), col("lon").cast("int"), col("lat").cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        val bks = bucketsB.value
        it.flatMap { case (qid, qlon, qlat) =>
          val (cq, cr) = HexCells.cell(qlon, qlat, res)
          val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
          var seen = 0
          var ring = 0
          var done = false
          while (!done) {
            for ((bq, br) <- HexCells.ring(cq, cr, ring)) {
              bks.get((bq, br)).foreach { arr =>
                for ((pid, plon, plat) <- arr) {
                  seen += 1
                  if (pid != qid) {
                    val dx = (qlon.toDouble - plon); val dy = (qlat.toDouble - plat)
                    cand += ((dx * dx + dy * dy, pid))
                  }
                }
              }
            }
            // secondary sort pass over the accumulated candidates
            val sorted = cand.sortBy(identity)
            val kth = if (sorted.length >= k) sorted(k - 1)._1 else Double.PositiveInfinity
            val lower = math.max(0.0, (ring + 1) * ringStep - 2 * r0)
            if ((sorted.length >= k && kth <= lower * lower) || seen >= total) done = true
            else ring += 1
          }
          cand.sortBy(identity).take(k).zipWithIndex.map { case ((_, pid), i) =>
            (qid, (i + 1).toLong, pid)
          }
        }
      }
      .toDF("qid", "rk", "pid")
  }
}
