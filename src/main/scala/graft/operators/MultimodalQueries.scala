package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.{AudioCodec, AudioTable, ImageCodec, ImageTable}

/** Multimodal path: the binary image column is decoded inside mapPartitions
  * (batched, executor-side — the real Spark plumbing for opaque media
  * columns). The codec itself is our deterministic stand-in (no image libs
  * in this environment, see ImageCodec); the per-row invariant (byte-exact
  * for lossless, PSNR >= 40 dB for lossy, caption equality) is asserted in
  * MultimodalSpec and surfaced here as engine-computed columns.
  */
object MultimodalQueries {

  final case class Decoded(image_id: String, dec_w: Int, dec_h: Int,
                           n_px: Long, mean_luma: Long, psnr_ok: Boolean,
                           lossless_exact: Boolean)

  def decoded(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "fmt", "bytes")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes) =>
          val (w, h, px) = ImageCodec.decode(bytes)
          val truth = ImageCodec.pixels(id, w, h)
          var luma = 0L
          var i = 0
          while (i < px.length) { luma += (px(i) & 0xff); i += 1 }
          val p = ImageCodec.psnr(truth, px)
          Decoded(id, w, h, px.length.toLong, luma / math.max(1, px.length),
            p >= 40.0, fmt != "raw" || java.util.Arrays.equals(truth, px))
        }
      }.toDF()
  }

  val defs: Seq[QueryDef] = Seq(

    // decoded metadata must round-trip the schema-derived w/h; byte count
    // is arithmetic on both sides
    QueryDef.sql("m_img_meta",
      s"""SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, fmt,
         |  CAST(w AS BIGINT) * h * 3 AS n_px
         |FROM ${ImageTable.duckSql()} ORDER BY image_id""".stripMargin) { (s, dir) =>
      val imgs = ImageTable.withBytes(ImageTable.df(s, dir))
      decoded(imgs)
        .select(col("image_id"), col("dec_w").cast("long").as("w"),
          col("dec_h").cast("long").as("h"), col("n_px"))
        .join(imgs.select("image_id", "fmt"), Seq("image_id"))
        .select("image_id", "w", "h", "fmt", "n_px")
        .orderBy("image_id")
    },

    // decode -> 2x nearest-neighbour downsample in the same mapPartitions
    // batch (the resize/frame-sample plumbing). The decoded pixels are not
    // SQL-derivable, so the oracle is the frozen expected table from the
    // deterministic seed (FrozenOracles; invariants re-proved in
    // MultimodalSpec).
    QueryDef.sql("m_img_resize", FrozenOracles.mImgResize) { (s, dir) =>
      val spark = s
      import spark.implicits._
      ImageTable.withBytes(ImageTable.df(s, dir))
        .select("image_id", "bytes")
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val (w, h, px) = ImageCodec.decode(bytes)
            val (rw, rh) = (w / 2, h / 2)
            val out = new Array[Byte](rw * rh * 3)
            var y = 0
            while (y < rh) {
              var x = 0
              while (x < rw) {
                var c = 0
                while (c < 3) {
                  out((y * rw + x) * 3 + c) = px(((y * 2) * w + x * 2) * 3 + c)
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            var luma = 0L
            out.foreach(b => luma += (b & 0xff))
            (id, rw.toLong, rh.toLong, luma / math.max(1, out.length))
          }
        }
        .toDF("image_id", "rw", "rh", "mean_luma")
        .orderBy("image_id")
    },

    // raster -> vector tile aggregation (the north star names this shape):
    // decode image bytes in mapPartitions, join each image's decoded raster
    // stats to its first-match tile, and aggregate per tile — the vector
    // side is the per-tile manifest (count, total luma, luma-weighted
    // extremes). Decode is not SQL-derivable, so the oracle is frozen.
    QueryDef.sql("m_tile_raster", FrozenOracles.mTileRaster) { (s, dir) =>
      val imgs = ImageTable.withBytes(ImageTable.df(s, dir))
      val tiles = imgs.select(col("image_id"), GeoQueries.tileCol.as("tile"))
      decoded(imgs)
        .join(tiles, Seq("image_id"))
        .groupBy("tile")
        .agg(count(lit(1)).as("n_images"),
          sum("mean_luma").as("sum_luma"),
          min("mean_luma").as("min_luma"),
          max("mean_luma").as("max_luma"))
        .orderBy("tile")
    },

    // raster mosaic PYRAMID: the decoded-luma rollup through every zoom
    // level of g_tile_pyramid's quadtree — mapPartitions decode feeds the
    // base-cell aggregate (the one full shuffle), then the bounded cell
    // frame explodes ancestor keys into a second tiny groupBy. The decoded
    // pixels are not SQL-derivable, so the oracle is the frozen expected
    // table; the rollup arithmetic (sum/sum) is associative by
    // construction and the geometry is pinned by g_tile_pyramid's oracle.
    QueryDef.sql("m_mosaic_pyramid", FrozenOracles.mMosaicPyramid) { (s, dir) =>
      val zmax = GeoQueries.PyrZMax
      val imgs = ImageTable.withBytes(ImageTable.df(s, dir))
      val pos = imgs.select(col("image_id"),
        expr(s"shiftright(CAST(lon AS BIGINT) + 1800000000, ${32 - zmax})").as("cx"),
        expr(s"shiftright(CAST(lat AS BIGINT) + 900000000, ${31 - zmax})").as("cy"))
      val base = decoded(imgs).join(pos, Seq("image_id"))
        .groupBy("cx", "cy")
        .agg(count(lit(1)).as("n_images"), sum("mean_luma").as("sum_luma"))
      base.withColumn("z", explode(sequence(lit(0L), lit(zmax.toLong))))
        .groupBy(col("z"),
          expr(s"shiftright(cx, $zmax - CAST(z AS INT))").as("cx"),
          expr(s"shiftright(cy, $zmax - CAST(z AS INT))").as("cy"))
        .agg(sum("n_images").as("n_images"), sum("sum_luma").as("sum_luma"))
        .orderBy("z", "cx", "cy")
    },

    // per-row invariant flags (engine-side decode; frozen expected table)
    QueryDef.sql("m_img_invariant", FrozenOracles.mImgInvariant) { (s, dir) =>
      decoded(ImageTable.withBytes(ImageTable.df(s, dir)))
        .select(col("image_id"), col("mean_luma"),
          col("psnr_ok").cast("string").as("psnr_ok"),
          col("lossless_exact").cast("string").as("lossless_exact"))
        .orderBy("image_id")
    },

    // video frame sampling: each row is treated as a short frame stream
    // (n_frames = phash % 7 + 2; frame f is the deterministic synthetic
    // frame keyed "id#f" — the decode stand-in, like ImageCodec itself);
    // uniform-sample min(4, n) frames and DECODE the sampled ones in the
    // same mapPartitions batch. The sampling plan (counts + indices) is
    // SQL-derivable and gated exactly; the decoded-frame dimension check
    // rides along as frames_ok (per-frame pixel equality is re-proved in
    // MultimodalSpec).
    QueryDef.sql("m_frame_sample", {
      val n = "(phash % 7 + 2)"
      s"""SELECT image_id, CAST($n AS BIGINT) AS n_frames,
         |  CASE WHEN $n >= 4 THEN
         |    '0,' || CAST($n // 4 AS VARCHAR) || ',' || CAST(2 * $n // 4 AS VARCHAR)
         |      || ',' || CAST(3 * $n // 4 AS VARCHAR)
         |  WHEN $n = 3 THEN '0,1,2' ELSE '0,1' END AS frame_idxs,
         |  CAST(LEAST($n, 4) AS BIGINT) AS n_sampled,
         |  'true' AS frames_ok
         |FROM ${ImageTable.duckSql()} ORDER BY image_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      ImageTable.df(s, dir).select("image_id", "phash", "w", "h")
        .as[(String, Long, Int, Int)]
        .mapPartitions { it =>
          it.map { case (id, phash, w, h) =>
            val n = (phash % 7 + 2).toInt
            val idxs = if (n >= 4) (0 until 4).map(i => i * n / 4) else 0 until n
            val ok = idxs.forall { f =>
              val bytes = ImageCodec.encode("raw", s"$id#$f", w, h)
              val (dw, dh, px) = ImageCodec.decode(bytes)
              dw == w && dh == h && px.length == w * h * 3
            }
            (id, n.toLong, idxs.mkString(","), idxs.size.toLong, ok.toString)
          }
        }
        .toDF("image_id", "n_frames", "frame_idxs", "n_sampled", "frames_ok")
        .orderBy("image_id")
    },

    // audio metadata: decode the binary audio column in mapPartitions and
    // check the container round-trips the schema-derived sample rate /
    // count; duration is integer arithmetic on both sides. The third
    // modality (image / video / audio) through the same opaque-binary
    // plumbing.
    QueryDef.sql("m_audio_meta",
      s"""SELECT audio_id, CAST(sr AS BIGINT) AS sr,
         |  CAST(n_samples AS BIGINT) AS n_samples, fmt,
         |  CAST(n_samples * 1000 // sr AS BIGINT) AS dur_ms
         |FROM ${AudioTable.duckSql()} ORDER BY audio_id""".stripMargin) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val aud = AudioTable.withBytes(AudioTable.df(s, dir))
      aud.select("audio_id", "fmt", "bytes")
        .as[(String, String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, fmt, bytes) =>
            val (sr, pcm) = AudioCodec.decode(bytes)
            (id, sr.toLong, pcm.length.toLong, fmt, pcm.length.toLong * 1000 / sr)
          }
        }
        .toDF("audio_id", "sr", "n_samples", "fmt", "dur_ms")
        .orderBy("audio_id")
    },

    // windowed audio feature extraction: frame decoded PCM into 256-sample
    // windows, per-frame mean-square energy, per-clip aggregate + the
    // per-row invariant flags (SNR >= 40 dB for lossy, byte-exact for
    // lossless — re-proved in MultimodalSpec). Decoded samples are not
    // SQL-derivable, so the oracle is the frozen expected table from the
    // deterministic seed.
    QueryDef.sql("m_audio_window", FrozenOracles.mAudioWindow) { (s, dir) =>
      val spark = s
      import spark.implicits._
      AudioTable.withBytes(AudioTable.df(s, dir))
        .select("audio_id", "fmt", "bytes")
        .as[(String, String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, fmt, bytes) =>
            val (_, pcm) = AudioCodec.decode(bytes)
            val nf = pcm.length / 256
            var sumMs = 0L
            var peakMs = 0L
            var f = 0
            while (f < nf) {
              var sq = 0L
              var i = f * 256
              val end = i + 256
              while (i < end) { val v = pcm(i).toLong; sq += v * v; i += 1 }
              val ms = sq / 256
              sumMs += ms
              if (ms > peakMs) peakMs = ms
              f += 1
            }
            val truth = AudioCodec.samples(id, pcm.length)
            val snrOk = AudioCodec.snr(truth, pcm) >= 40.0
            val exact = fmt != "pcm16" || java.util.Arrays.equals(
              truth.map(_.toInt), pcm.map(_.toInt))
            (id, nf.toLong, sumMs / math.max(1, nf), peakMs,
              snrOk.toString, exact.toString)
          }
        }
        .toDF("audio_id", "n_frames", "mean_ms", "peak_ms", "snr_ok", "lossless_exact")
        .orderBy("audio_id")
    },

    // audio resample: 2x decimation in the same mapPartitions batch (the
    // resample plumbing — sample count and rate halve, duration is
    // preserved); integer checksum over the kept samples. Frozen oracle.
    QueryDef.sql("m_audio_resample", FrozenOracles.mAudioResample) { (s, dir) =>
      val spark = s
      import spark.implicits._
      AudioTable.withBytes(AudioTable.df(s, dir))
        .select("audio_id", "bytes")
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val (sr, pcm) = AudioCodec.decode(bytes)
            var sum = 0L
            var n = 0L
            var i = 0
            while (i < pcm.length) { sum += pcm(i); n += 1; i += 2 }
            (id, (sr / 2).toLong, n, sum)
          }
        }
        .toDF("audio_id", "r_sr", "r_n", "sum_s")
        .orderBy("audio_id")
    },

    // phash-band image near-dup: plant a <=2-bit-perturbed variant for 20%
    // of images, then find every pair within Hamming distance 3 via the
    // 4x15-bit band blocking join (PhashDup). The oracle replays the
    // variant planting, the banding, the bucket cap and the bit_count
    // confirm in DuckDB bit arithmetic.
    QueryDef.sql("m_phash_dup", {
      def h(e: String) = graft.core.PortableHash.duckSql(e)
      val cap = PhashDup.BucketCap
      s"""WITH ${ImageTable.duckCte()},
         |corpus AS (
         |  SELECT image_id, phash FROM img
         |  UNION ALL
         |  SELECT image_id || '_v',
         |    xor(xor(phash, 1::BIGINT << CAST(${h("('pv1:' || image_id)")} % 60 AS INT)),
         |        1::BIGINT << CAST(${h("('pv2:' || image_id)")} % 60 AS INT))
         |  FROM img WHERE ${h("('pv:' || image_id)")} % 5 = 0),
         |bands AS (
         |  SELECT image_id, phash, b * 32768 + ((phash >> (b * 15)) & 32767) AS bucket
         |  FROM corpus, generate_series(0, 3) t(b)),
         |ok AS (SELECT bucket FROM bands GROUP BY bucket HAVING COUNT(*) <= $cap),
         |bc AS (SELECT bands.* FROM bands JOIN ok USING (bucket)),
         |cand AS (
         |  SELECT DISTINCT x.image_id AS id_a, y.image_id AS id_b,
         |         x.phash AS pa, y.phash AS pb
         |  FROM bc x JOIN bc y ON x.bucket = y.bucket AND x.image_id < y.image_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(pa, pb)) <= ${PhashDup.MaxHamming}
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
      val img = ImageTable.df(s, dir).select("image_id", "phash")
      val variants = img
        .filter(ImageTable.h60(concat(lit("pv:"), col("image_id"))) % 5 === 0)
        .withColumn("f1", (ImageTable.h60(concat(lit("pv1:"), col("image_id"))) % 60).cast("int"))
        .withColumn("f2", (ImageTable.h60(concat(lit("pv2:"), col("image_id"))) % 60).cast("int"))
        .select(concat(col("image_id"), lit("_v")).as("image_id"),
          col("phash")
            .bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), f1)"))
            .bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), f2)")).as("phash"))
      PhashDup(img.unionByName(variants)).orderBy("id_a", "id_b")
    }
  )
}
