package graft

/** Dev profiling main: cost layers of d_dup_groups (pair pipeline vs the
  * HashMin convergence rounds). */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t(name: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val lsh = operators.DocQueries.defs.find(_.name == "d_minhash_lsh").get
    t("pair pipeline (lsh)") {
      lsh.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val dg = operators.DocQueries.defs.find(_.name == "d_dup_groups").get
    t("full dup_groups") {
      dg.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
