package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev profiling main for the round-6 optimization pass: decomposes the
  * bench ceilings (kmeans_200k, span_dup_100k, dist_join_1m, minhash_lsh)
  * into sub-stage timings and A/Bs candidate optimizations inline before
  * they are committed to the operators. Usage:
  *   SPARK_GRAFT_PROFILE=kmeans,spandup,distjoin,minhash sbt "runMain graft.ProfileR6"
  */
object ProfileR6 {

  def t(name: String)(df: DataFrame): Double = {
    df.write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[profile] $name%-40s $sec%8.3f s")
    sec
  }

  def tThunk(name: String)(mk: () => DataFrame): Double = {
    val d0 = mk(); d0.write.format("noop").mode("overwrite").save()
    core.Caching.freeLocalCheckpoints(d0)
    val t0 = System.nanoTime()
    val d1 = mk(); d1.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    core.Caching.freeLocalCheckpoints(d1)
    println(f"[profile] $name%-40s $sec%8.3f s  (cons+exec)")
    sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "kmeans,spandup,distjoin,minhash")
      .split(",").map(_.trim).toSet
    val spark = Bench.session(cpus)
    import spark.implicits._

    // ---- headline floor: cached-input scan + expression costs -------------
    if (which("headline")) {
      val preParts = spark.sparkContext.defaultParallelism * 2
      val img = sources.ImageTable.df(spark, sfDir, 200, preParts = preParts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      img.count()
      t("hl: scan phash only")(img.select(col("phash")))
      t("hl: scan lon/lat")(img.select(col("lon"), col("lat")))
      t("hl: tile expr no agg")(img.select(operators.GeoQueries.tileCol.as("tile")))
      t("hl: tile_assign full")(img.select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n")))
      t("hl: skewed cols")(sources.ImageTable.skewed(img).select(col("lon"), col("lat"), col("phash")))
      t("hl: skew_agg full")({
        val sk = sources.ImageTable.skewed(img)
          .select(operators.GeoQueries.tileCol.as("tile"), col("phash"),
            pmod(xxhash64(col("image_id")), lit(16)).as("salt"))
        sk.groupBy("tile", "salt").agg(count(lit(1)).as("pc"), sum(col("phash") % 1000000).as("ps"))
          .groupBy("tile").agg(sum("pc").as("cnt"), sum("ps").as("s"))
      })
      t("hl: pip mask full")(img
        .select(operators.Pip.mask(col("lon"), col("lat"), operators.Pip.fixtureSet).as("m"))
        .groupBy("m").agg(count(lit(1)).as("n")))
      t("hl: join_pricing")(operators.RelationalQueries.defs.find(_.name == "q_join_pricing").get
        .fn(spark, sfDir))
      t("hl: cosine_dup")(operators.EmbedQueries.defs.find(_.name == "e_cosine_dup").get
        .fn(spark, sfDir))
      t("hl: tile_pyramid")(operators.GeoQueries.tilePyramid(img))
      t("hl: groupBy(fmt).count")(img.groupBy("fmt").count())
      t("hl: groupBy(phash%1000).count")(img.groupBy((col("phash") % 1000).as("k")).count())
      t("hl: tile agg rep2")(img.select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n")))
      t("hl: tile agg rep3")(img.select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n")))
      t("hl: lonlat agg")(img.select((col("lon") % 1000).as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n")))

      t("hl: range agg")(spark.range(1000000L)
        .groupBy((col("id") % 1000).as("k")).agg(count(lit(1))))
      t("hl: cache phash agg1000")(img.groupBy((col("phash") % 1000).as("k")).agg(count(lit(1))))
      val imgNoCache = sources.ImageTable.df(spark, sfDir, 200, preParts = preParts)
      t("hl: nocache lon agg")(imgNoCache.select((col("lon") % 1000).as("k"))
        .groupBy("k").agg(count(lit(1))))

      // stage-level attribution of ONE tile_assign execution
      val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
      val lis = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages += ((si.stageId, si.name.take(40),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.executorRunTime, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(lis)
      val df = img.select(operators.GeoQueries.tileCol.as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n"))
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(1000)
      stages.foreach { case (id, n, wall, run, nt) =>
        println(f"[stage] $id%4d $n%-40s wall=${wall}ms taskRunSum=${run}ms tasks=$nt") }
      spark.sparkContext.removeSparkListener(lis)
    }

    // ---- kmeans_200k ------------------------------------------------------
    if (which("kmeans")) {
      val mult = 100
      def scaledCorpus: DataFrame =
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
          .repartition(32)
          .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
          .select(
            (col("vec_id") * mult + col("rep")).as("vec_id"),
            expr("transform(v, (x, i) -> CASE WHEN i = CAST(rep % 64 AS INT) THEN x + rep % 7 - 3 ELSE x END)").as("v"))

      t("km: corpus only")(scaledCorpus)
      tThunk("km: corpus localCheckpoint") { () => scaledCorpus.localCheckpoint() }

      // one assign pass over a checkpointed corpus, k=64
      def ip(x: String, y: String) = graft.plans.LongDot(col(x), col(y))
      def centInit(v: DataFrame, k: Int): DataFrame = {
        val wInit = org.apache.spark.sql.expressions.Window.orderBy("h", "vec_id")
        v.withColumn("h", expr(core.PortableHash.sparkSql("('kmc:' || CAST(vec_id AS STRING))")))
          .orderBy("h", "vec_id").limit(k)
          .withColumn("j", row_number().over(wInit).cast("long") - 1L)
          .select(col("j"), col("v").as("c"))
      }
      def assign(v: DataFrame, c: DataFrame): DataFrame =
        v.withColumn("vv", ip("v", "v"))
          .crossJoin(broadcast(c.withColumn("cc", ip("c", "c"))))
          .withColumn("dist", col("vv") - lit(2L) * ip("v", "c") + col("cc"))
          .groupBy("vec_id")
          .agg(min_by(col("v"), struct(col("dist"), col("j"))).as("v"),
            min(struct(col("dist"), col("j"))).as("m"))
          .select(col("vec_id"), col("v"), col("m.j").as("j"), col("m.dist").as("dist"))

      tThunk("km: ckpt corpus + 1 assign (k=64)") { () =>
        val v = scaledCorpus.localCheckpoint()
        assign(v, centInit(v, 64))
      }
      tThunk("km: ckpt corpus + full eager lloyd") { () =>
        val v = scaledCorpus.localCheckpoint()
        var cent = centInit(v, 64).localCheckpoint()
        for (_ <- 1 to 2) {
          val asg = assign(v, cent).select(col("vec_id"), col("v"), col("j"))
          val upd = asg.select(col("j"), posexplode(col("v")).as(Seq("d", "qv")))
            .groupBy("j", "d").agg(expr("sum(qv) div count(1)").as("cv"))
            .groupBy("j").agg(transform(array_sort(collect_list(struct(col("d"), col("cv")))),
              x => x.getField("cv")).as("c"))
          val next = upd.unionByName(cent.join(broadcast(upd), Seq("j"), "left_anti"))
            .localCheckpoint()
          core.Caching.freeLocalCheckpoints(cent)
          cent = next
        }
        assign(v, cent)
          .groupBy("j").agg(count(lit(1)).as("n"), sum("dist").as("inertia"))
          .orderBy("j")
      }
      tThunk("km: current kmeansScaled") { () =>
        operators.EmbedQueries.kmeansScaled(spark, sfDir, 100)
      }
    }

    // ---- span_dup_100k ----------------------------------------------------
    if (which("spandup")) {
      def input: DataFrame =
        spark.read.parquet(s"$sfDir/documents.parquet").repartition(64)
          .withColumn("rep", explode(sequence(lit(0), lit(19))))
          .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L)
          .select("doc_id", "text")
      val wordsExpr = "regexp_extract_all(text, '\\\\S+', 0)"

      t("sd: input build")(input)
      val w8 = input.select(col("doc_id"), expr(wordsExpr).as("ws"))
        .filter(size(col("ws")) >= 8)
      t("sd: words")(w8)
      val gMd5 = w8
        .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 7)))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          expr(core.PortableHash.sparkSql("array_join(slice(ws, i, 8), ' ')")).as("gh"))
      t("sd: grams md5 (current)")(gMd5)
      val gXx = w8
        .withColumn("hws", transform(col("ws"), w => xxhash64(w)))
        .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 7)))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          xxhash64(slice(col("hws"), col("i"), lit(8))).as("gh"))
      t("sd: grams xxhash64(slice(hws)) (cand)")(gXx)
      t("sd: dup-gram agg over md5 grams")(
        gMd5.groupBy("gh").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx")).select("gh"))
      t("sd: full spanDup (current)")(operators.DocQueries.spanDup(input))

      // decompose the NEW shape
      val gNew = w8
        .withColumn("hws", transform(col("ws"), w => xxhash64(w)))
        .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 7)))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          xxhash64(slice(col("hws"), col("i"), lit(8))).as("gh"))
      val dupNew = gNew.groupBy("gh")
        .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        .filter(col("mn") =!= col("mx")).select("gh")
      t("sd: NEW dup-gram agg")(dupNew)
      t("sd: NEW semi-join only")(gNew.join(dupNew, Seq("gh"), "left_semi"))
      t("sd: NEW semi-join + islands agg")(
        gNew.join(dupNew, Seq("gh"), "left_semi")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("dup_grams"),
            (graft.plans.MaxConsecRun(sort_array(collect_list(col("i")))) + lit(7L)).as("max_span")))
      t("sd: full spanDup NEW")(operators.DocQueries.spanDup(input))

      // candidate full variant: xxhash grams + single computation via checkpoint
      def spanDupXx(d: DataFrame): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val w8v = d.select(col("doc_id"), expr(wordsExpr).as("ws"))
          .filter(size(col("ws")) >= 8)
          .withColumn("n_grams", (size(col("ws")) - 7).cast("long"))
        val g = w8v
          .withColumn("hws", transform(col("ws"), w => xxhash64(w)))
          .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 7)))
          .select(col("doc_id"), col("i").cast("long").as("i"),
            xxhash64(slice(col("hws"), col("i"), lit(8))).as("gh"))
        val dupHashes = g.groupBy("gh")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("gh")
        val runs = g.join(dupHashes, Seq("gh"), "left_semi")
          .withColumn("grp",
            col("i") - row_number().over(Window.partitionBy("doc_id").orderBy("i")))
          .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
        val pd = runs.groupBy("doc_id")
          .agg(sum("run").as("dup_grams"), (max("run") + 7).as("max_span"))
        w8v.select("doc_id", "n_grams").join(pd, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
            coalesce(col("max_span"), lit(0L)).as("max_span"))
          .orderBy("doc_id")
      }
      tThunk("sd: full spanDup xxhash variant") { () => spanDupXx(input) }
    }

    // ---- dist_join_1m -----------------------------------------------------
    if (which("distjoin")) {
      val preParts = spark.sparkContext.defaultParallelism * 2
      val img = sources.ImageTable.df(spark, sfDir, 200, preParts = preParts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      img.count()
      val r = 1000000L
      t("dj: current distJoin")(operators.GeoQueries.distJoin(img, r))

      // 5-cell half-neighbourhood variant
      def distJoin5(img: DataFrame, r: Long): DataFrame = {
        val pts = img.select(col("image_id"),
          col("lon").cast("long").as("lon"), col("lat").cast("long").as("lat"))
          .withColumn("cx", expr(s"lon div ${r}L"))
          .withColumn("cy", expr(s"lat div ${r}L"))
        val build = pts.select(col("image_id").as("id_b"),
          col("lon").as("lon_b"), col("lat").as("lat_b"), col("cx"), col("cy"))
        val probe = pts
          .withColumn("o", explode(array(
            struct(lit(0L).as("ox"), lit(0L).as("oy")),
            struct(lit(1L).as("ox"), lit(0L).as("oy")),
            struct(lit(-1L).as("ox"), lit(1L).as("oy")),
            struct(lit(0L).as("ox"), lit(1L).as("oy")),
            struct(lit(1L).as("ox"), lit(1L).as("oy")))))
          .select(col("image_id").as("id_a"), col("lon").as("lon_a"), col("lat").as("lat_a"),
            (col("cx") + col("o.ox")).as("cx"), (col("cy") + col("o.oy")).as("cy"),
            (col("o.ox") === 0L && col("o.oy") === 0L).as("same"))
        val d2 = (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")) +
          (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b"))
        probe.join(build, Seq("cx", "cy"))
          .filter(!col("same") || col("id_a") < col("id_b"))
          .filter(col("id_a") =!= col("id_b"))
          .withColumn("dist2", d2)
          .filter(col("dist2") <= lit(r * r))
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"), col("dist2"))
          .orderBy("id_a", "id_b")
      }
      t("dj: 5-cell variant")(distJoin5(img, r))
    }

    // ---- minhash_lsh (new per-row-kernel shape) ---------------------------
    if (which("minhash")) {
      val d0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      val planted = d0.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 20000000L)
      val all = d0.unionByName(planted)
      val wordsExpr = "regexp_extract_all(text, '\\\\S+', 0)"
      val withWs = all
        .withColumn("ws", expr(wordsExpr))
        .filter(size(col("ws")) > 0)
        .withColumn("words", array_distinct(col("ws")))
        .withColumn("n", size(col("words")).cast("long"))
      val wsets = withWs.select(col("doc_id"), col("n"), col("words"))
      t("mh: wsets map")(wsets)
      val bands = withWs.select(col("doc_id"), col("n"),
        explode(graft.plans.MinhashBands(col("ws"), operators.DocQueries.mhKernel)).as("bucket"))
      t("mh: bands map (kernel)")(bands)
      val ok = bands.groupBy("bucket").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 256).select("bucket")
      val bc = bands.join(ok, Seq("bucket"), "left_semi")
      t("mh: bc capped")(bc)
      val cand = bc.as("x").join(bc.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .distinct()
      t("mh: cand")(cand)
      val inter = cand
        .join(wsets.select(col("doc_id").as("a"), col("words").as("wa")), Seq("a"))
        .join(wsets.select(col("doc_id").as("b"), col("words").as("wb")), Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("wa"), col("wb"))).cast("long").as("i"),
          col("na"), col("nb"))
      t("mh: inter (array_intersect)")(inter)
      val fullDf = operators.DocQueries.defs.find(_.name == "d_minhash_lsh").get.fn(spark, sfDir)
        .limit(1000000)
      t("mh: full d_minhash_lsh a")(fullDf)
      t("mh: full d_minhash_lsh b")(fullDf)
      t("mh: full d_minhash_lsh c")(fullDf)
    }

    spark.stop()
  }
}
