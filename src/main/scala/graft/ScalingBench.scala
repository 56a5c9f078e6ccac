package graft

import java.nio.file.{Files, Paths}

/** Two-cluster-size scaling evidence (BASELINE.json north rule): the same
  * job at two parallelism levels on identical input — the sandbox stand-in
  * for N vs 4N executors. Writes BENCH/BASELINE.md with throughput at both
  * levels and the scaling efficiency (target >= 0.8).
  *
  * Report hygiene (round-2 verdict): per-round tables and the median
  * efficiency are reported alongside the merged-minima headline, so the
  * run-to-run variance of this hypervisor-stolen host is visible instead of
  * hidden behind the best case.
  */
object ScalingBench {

  val Jobs = Seq("tile_assign", "pip_join", "skew_agg")

  def run(cpus: String, sfDir: String, mult: Int): (Long, Map[String, Double]) = {
    val spark = Bench.session(cpus)
    try {
      // input derivation stays inline (uncached): the measured job is the
      // full read-derive-assign-aggregate pipeline, same methodology at
      // both parallelism levels
      val img = sources.ImageTable.df(spark, sfDir, mult,
        preParts = spark.sparkContext.defaultParallelism * 2)
      val rows = img.count()
      // thunks forced only for the selected jobs: constructing a filtered-
      // out entry would itself run jobs (knn checkpoint, ANN count)
      val qs = Bench.headline(spark, sfDir, img, rows)
        .filter(q => Jobs.contains(q._1))
        .map { case (n, mk) => (n, mk()) }
      qs.foreach(_._2.write.format("noop").mode("overwrite").save()) // warm-up
      val times = qs.map { case (n, df) =>
        n -> (1 to 2).map(_ => Bench.timeIt(df)).min
      }.toMap
      (rows, times)
    } finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "20").toInt
    // the sandbox hypervisor steals CPU in bursts (historical steal ~50% of
    // user ticks in /proc/stat), so interleave the two configs over several
    // rounds and take per-config minima — the uncontended capability is what
    // a dedicated cluster would see
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    // The core pair is configurable: 8 vs 32 saturates every host vCPU at
    // the top config, which on this virtualized guest measures hypervisor
    // steal as much as the engine; 4 vs 16 keeps headroom at both levels
    // (the configuration a real N vs 4N executor cluster actually has —
    // executors never share their cores with a noisy co-tenant).
    val lo = sys.env.getOrElse("SPARK_GRAFT_CORES_LO", "8")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CORES_HI", "32")
    // efficiency normalizes by the ACTUAL core ratio, not a hardcoded 4x
    val factor = hi.trim.toDouble / lo.trim.toDouble

    var rows = 0L
    val perRound = scala.collection.mutable.ListBuffer.empty[(Map[String, Double], Map[String, Double])]
    for (_ <- 1 to rounds) {
      val (r, a) = run(lo, sfDir, mult)
      val (_, b) = run(hi, sfDir, mult)
      rows = r
      perRound += ((a, b))
    }
    def merge(sel: ((Map[String, Double], Map[String, Double])) => Map[String, Double]) =
      Jobs.map(j => j -> perRound.map(p => sel(p)(j)).min).toMap
    val tLo = merge(_._1)
    val tHi = merge(_._2)
    def eff(a: Double, b: Double) = (rows / b) / (factor * (rows / a))

    val report = new StringBuilder
    report ++= "# BENCH — measured baseline + scaling evidence\n\n"
    report ++= s"Input: image+caption table derived from `$sfDir/documents.parquet` x$mult = $rows rows.\n"
    report ++= s"Same job, same input, two parallelism levels (sandbox stand-in for N vs ${factor.toInt}N executors).\n" +
      s"Headline times are per-config minima over $rounds interleaved rounds (the sandbox hypervisor steals CPU in bursts; /proc/stat shows historical steal ~50% of user ticks); per-round tables and medians follow.\n\n"
    report ++= s"| job | local[$lo] sec | local[$hi] sec | local[$lo] rows/s | local[$hi] rows/s | scaling efficiency |\n"
    report ++= "|---|---|---|---|---|---|\n"
    for (name <- Jobs) {
      val (a, b) = (tLo(name), tHi(name))
      report ++= f"| $name | $a%.2f | $b%.2f | ${(rows / a).toLong} | ${(rows / b).toLong} | ${eff(a, b)}%.2f |\n"
    }
    report ++= f"\nScaling efficiency = throughput($hi) / ($factor%.1f x throughput($lo)); target >= 0.8.\n"

    report ++= "\n## Per-round measurements\n\n"
    report ++= s"| round | job | local[$lo] sec | local[$hi] sec | efficiency |\n|---|---|---|---|---|\n"
    val perJobEffs = Jobs.map(j => j -> scala.collection.mutable.ListBuffer.empty[Double]).toMap
    perRound.zipWithIndex.foreach { case ((a, b), i) =>
      for (name <- Jobs) {
        val e = eff(a(name), b(name))
        perJobEffs(name) += e
        report ++= f"| ${i + 1} | $name | ${a(name)}%.2f | ${b(name)}%.2f | $e%.2f |\n"
      }
    }
    report ++= "\n| job | median efficiency | min | max |\n|---|---|---|---|\n"
    for (name <- Jobs) {
      val es = perJobEffs(name).toSeq
      report ++= f"| $name | ${median(es)}%.2f | ${es.min}%.2f | ${es.max}%.2f |\n"
    }

    val out = sys.env.getOrElse("SPARK_GRAFT_REPORT", "BENCH/BASELINE.md")
    val parent = Paths.get(out).toAbsolutePath.getParent
    if (parent != null) Files.createDirectories(parent)
    Files.writeString(Paths.get(out), report.toString)
    println(report.toString)
  }
}
