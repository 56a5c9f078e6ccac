package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact kNN via hex-ring expansion (the H3-style path the north star
  * names), fully shuffle-native: points are bucketed into hex cells and the
  * cell id is a JOIN KEY, never a driver-side index (the round-1 version
  * collected the points table to the driver; that shape is gone).
  *
  * Two co-partitioned expansion passes plus a brute-force tail:
  *   pass 1: each query joins points in cells at hex distance <= 1
  *           (7 probe cells), takes a window top-k by exact distance, and
  *           is CERTIFIED if its k-th distance is strictly inside the
  *           geometric lower bound for anything outside the searched disk;
  *   pass 2: unresolved queries re-join at hex distance <= 3 (37 cells) —
  *           the "iterative ring expansion with a secondary sort pass";
  *   pass 3: still-unresolved queries fall back to brute force.
  *
  * Certification bound: after searching all cells at hex distance <= D,
  * any unseen point sits in a cell at hex distance >= D+1, i.e. at least
  * HexCells.minRingDist(res, D+1) from the query's CELL CENTER (exact
  * polygon geometry — the ring boundary's re-entrant valley vertices make
  * this strictly smaller than the big-hexagon inradius), minus r0 for the
  * query's own offset within its cell. STRICT <: squared distances reach
  * ~1.3e19, past 2^53 double exactness, so boundary ties must fall through
  * to the brute pass where the oracle's (d, pid) order decides.
  *
  * Distances are (dx*dx + dy*dy) in DOUBLE over exact int32 operands —
  * IEEE-deterministic and identical in any engine; ties break on pid.
  */
object KnnHex {

  /** Hex resolution targeting ~k points per cell (the hex analogue of
    * Knn.adaptiveCellSize): pick the res whose hexagon area is closest to
    * k/density, so pass-1 probes ~7k candidates at any density.
    */
  def adaptiveRes(n: Long, k: Int): Int = {
    // hexagon area = (3*sqrt(3)/2) * r0^2 with r0 = HexCells.radius(res)
    val target = math.sqrt(Knn.WorldArea * k / (2.598 * math.max(1L, n).toDouble))
    val res = math.round(math.log(4e8 / target) / math.log(math.sqrt(7.0))).toInt
    math.max(0, math.min(10, res))
  }

  def apply(points: DataFrame, queries: DataFrame, k: Int, res: Int): DataFrame = {
    val b = build(points, queries, k, res)
    b.res1.select("qid", "rk", "pid")
      .unionByName(b.res2.select("qid", "rk", "pid"))
      .unionByName(b.brute.select("qid", "rk", "pid"))
      .select(col("qid"), col("rk").cast("long").as("rk"), col("pid"))
  }

  /** Diagnostic: (total, unresolved after pass 1, unresolved after pass 2)
    * query counts — pass 3 (brute) handles the last number; callers assert
    * it stays a small fraction.
    */
  def passStats(points: DataFrame, queries: DataFrame, k: Int, res: Int): (Long, Long, Long) = {
    val b = build(points, queries, k, res)
    (b.qs.count(), b.un1.count(), b.un2.count())
  }

  private case class Built(qs: DataFrame, res1: DataFrame, un1: DataFrame,
      res2: DataFrame, un2: DataFrame, brute: DataFrame)

  private def build(points: DataFrame, queries: DataFrame, k: Int, res: Int): Built = {
    val r0 = HexCells.radius(res)
    def lbSq(d: Int): Double = {
      val lb = math.max(0.0, HexCells.minRingDist(res, d) - r0)
      lb * lb
    }

    val pts = points
      .select(col("id").cast("long").as("pid"),
        col("lon").cast("int").as("plon"), col("lat").cast("int").as("plat"))
      // codegen cell encoder (plans.HexCellId) — the round-3 row-at-a-time
      // UDFs for cell id / ring probes were the last interpreted kernels in
      // an oracle-gated path
      .withColumn("pcell", graft.plans.CellId.hex(col("plon"), col("plat"), res))
    val qs = queries.select(col("id").cast("long").as("qid"),
      col("lon").cast("int").as("qlon"), col("lat").cast("int").as("qlat"))

    val dist: Column =
      (col("qlon").cast("double") - col("plon")) * (col("qlon").cast("double") - col("plon")) +
        (col("qlat").cast("double") - col("plat")) * (col("qlat").cast("double") - col("plat"))

    /** struct(n, items) -> (qid, rk, pid) rows. */
    def explodeTopk(agged: DataFrame): DataFrame =
      agged.select(col("qid"), posexplode(col("tk").getField("items")))
        .select(col("qid"), (col("pos") + 1).as("rk"), col("col").getField("pid").as("pid"))

    /** one expansion pass: co-partitioned cell join out to hex distance
      * maxD, per-query top-k via the bounded DistTopK aggregate (k-slot
      * buffers, map-side combine — no window sort over candidates; see
      * Knn.pass1), and the certified/unresolved split. */
    def pass(qSet: DataFrame, maxD: Int): (DataFrame, DataFrame) = {
      // broadcast the (small) probe side so the point cloud streams
      // map-side instead of shuffling — see Knn.pass1
      val agged = broadcast(qSet
        .withColumn("jcell",
          explode(graft.plans.CellId.hexProbes(col("qlon"), col("qlat"), res, maxD))))
        .join(pts, col("jcell") === col("pcell") && col("qid") =!= col("pid"))
        .withColumn("d", dist)
        .groupBy("qid")
        .agg(graft.plans.DistTopK(col("d"), col("pid"), k).as("tk"))
        // when()-guarded: element_at(items, k) is ANSI-OOB when n < k (see
        // Knn.pass1 — don't rely on And short-circuit)
        .withColumn("final",
          when(col("tk").getField("n") >= k,
            element_at(col("tk").getField("items"), k).getField("d") < lit(lbSq(maxD + 1)))
            .otherwise(lit(false)))
        // pin the per-query aggregate: it fans out to the resolved output
        // AND the unresolved anti side, and pass 2 / the brute tail nest
        // the earlier passes' subtrees — without pinning, pass 1's join
        // re-executes ~5x per action (see Knn.apply for the verified
        // no-reuse behavior of broadcast-child plans)
        .localCheckpoint(false)
      val resolved = explodeTopk(agged.filter(col("final")))
      val unresolved = qSet.join(
        broadcast(agged.filter(col("final")).select("qid")), Seq("qid"), "left_anti")
      (resolved, unresolved)
    }

    val (res1, un1) = pass(qs, 1)
    val (res2, un2) = pass(un1, 3)
    val brute = explodeTopk(broadcast(un2)
      .join(pts, col("qid") =!= col("pid"))
      .withColumn("d", dist)
      .groupBy("qid")
      .agg(graft.plans.DistTopK(col("d"), col("pid"), k).as("tk")))

    Built(qs, res1, un1, res2, un2, brute)
  }
}
