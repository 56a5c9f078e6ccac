package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.core.PortableHash

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Exactness strategy: quantize to integer milli-units once, then all
  * distances/projections are exact BIGINT arithmetic — the DuckDB oracle
  * reproduces them bit-for-bit (float summation order never matters).
  */
object EmbedQueries {

  val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** integer milli-quantized vector (both engines round half-away-from-zero;
    * float*1000 can never land exactly on .5, so rounding is unambiguous). */
  private val quantExpr =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  private val duckQuant =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** 8 deterministic hyperplanes with integer weights in [-1000, 1000]. */
  lazy val hyperplanes: Array[Array[Long]] = Array.tabulate(8, Dim) { (p, d) =>
    PortableHash.h60(s"hp:$p:$d") % 2001 - 1000
  }

  val defs: Seq[QueryDef] = Seq(

    // brute-force top-k maximum-inner-product search (the exactness baseline
    // for the ANN path); k=3, 1-in-25 queries
    QueryDef.sql("e_topk_mips", {
      val dot = (1 to Dim).map(d => s"q.v[$d] * p.v[$d]").mkString(" + ")
      s"""WITH v AS (SELECT vec_id, $duckQuant AS v FROM embeddings),
         |q AS (SELECT * FROM v WHERE vec_id % 25 = 0),
         |r AS (SELECT q.vec_id AS qid, p.vec_id AS pid, ($dot) AS dot,
         |        row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dot) DESC, p.vec_id) AS rk
         |      FROM q JOIN v p ON p.vec_id <> q.vec_id)
         |SELECT qid, CAST(rk AS BIGINT) AS rk, pid, dot FROM r WHERE rk <= 3
         |ORDER BY qid, rk""".stripMargin
    }) { (s, dir) =>
      val v = emb(s, dir).select(col("vec_id"), expr(quantExpr).as("v"))
      val q = v.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val dot = expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0L, (acc, e) -> acc + e)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dot").desc, col("pid"))
      broadcast(q).join(v.withColumnRenamed("vec_id", "pid"), col("pid") =!= col("qid"))
        .withColumn("dot", dot)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk").cast("long").as("rk"), col("pid"), col("dot"))
        .orderBy("qid", "rk")
    },

    // random-hyperplane LSH bucketing (the ANN scale path: candidates only
    // meet inside a bucket; here we verify the bucket assignment itself)
    QueryDef.sql("e_lsh_bucket", {
      val bits = hyperplanes.zipWithIndex.map { case (w, p) =>
        val proj = (1 to Dim).map(d => s"(${w(d - 1)}) * v[$d]").mkString(" + ")
        s"CASE WHEN ($proj) >= 0 THEN ${1 << p} ELSE 0 END"
      }.mkString(" + ")
      s"""SELECT vec_id, CAST($bits AS BIGINT) AS bucket, CAST(label AS BIGINT) AS label
         |FROM (SELECT vec_id, label, $duckQuant AS v FROM embeddings) t
         |ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      val v = emb(s, dir).select(col("vec_id"), col("label"), expr(quantExpr).as("v"))
      val bucket = hyperplanes.zipWithIndex.map { case (w, p) =>
        val wArr = s"array(${w.mkString("L, ")}L)"
        val proj = expr(s"aggregate(zip_with($wArr, v, (x, y) -> x * y), 0L, (acc, e) -> acc + e)")
        when(proj >= 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      v.select(col("vec_id"), bucket.cast("long").as("bucket"),
          col("label").cast("long").as("label"))
        .orderBy("vec_id")
    },

    // embedding-cosine near-duplicate pairs: cos >= 0.9 decided in exact
    // integer arithmetic (100*dot^2 >= 81*|a|^2*|b|^2, dot >= 0) over
    // milli-quantized vectors; near-dups planted (1-in-10 re-inserted)
    QueryDef.sql("e_cosine_dup", {
      val dot = (1 to Dim).map(d => s"a.v[$d] * b.v[$d]").mkString(" + ")
      val na = (1 to Dim).map(d => s"a.v[$d] * a.v[$d]").mkString(" + ")
      val nb = (1 to Dim).map(d => s"b.v[$d] * b.v[$d]").mkString(" + ")
      s"""WITH v AS (
         |  SELECT vec_id, $duckQuant AS v FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, $duckQuant AS v
         |  FROM embeddings WHERE vec_id % 10 = 0)
         |SELECT a.vec_id AS ida, b.vec_id AS idb
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE ($dot) >= 0 AND 100 * ($dot) * ($dot) >= 81 * ($na) * ($nb)
         |ORDER BY ida, idb""".stripMargin
    }) { (s, dir) =>
      val base = emb(s, dir).select(col("vec_id"), expr(quantExpr).as("v"))
      val planted = base.filter(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val v = base.unionByName(planted)
      val a = v.select(col("vec_id").as("ida"), col("v").as("va"))
      val b = v.select(col("vec_id").as("idb"), col("v").as("vb"))
      def ip(x: String, y: String) =
        expr(s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0L, (acc, e) -> acc + e)")
      a.join(b, col("ida") < col("idb"))
        .withColumn("dot", ip("va", "vb"))
        .withColumn("na", ip("va", "va"))
        .withColumn("nb", ip("vb", "vb"))
        .filter(col("dot") >= 0 &&
          lit(100) * col("dot") * col("dot") >= lit(81) * col("na") * col("nb"))
        .select("ida", "idb")
        .orderBy("ida", "idb")
    },

    // bucket histogram: the skew diagnostic for the LSH path
    QueryDef.sql("e_bucket_hist", {
      val bits = hyperplanes.zipWithIndex.map { case (w, p) =>
        val proj = (1 to Dim).map(d => s"(${w(d - 1)}) * v[$d]").mkString(" + ")
        s"CASE WHEN ($proj) >= 0 THEN ${1 << p} ELSE 0 END"
      }.mkString(" + ")
      s"""SELECT bucket, COUNT(*) AS n FROM
         |(SELECT CAST($bits AS BIGINT) AS bucket
         | FROM (SELECT $duckQuant AS v FROM embeddings) t) b
         |GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, dir) =>
      val v = emb(s, dir).select(expr(quantExpr).as("v"))
      val bucket = hyperplanes.zipWithIndex.map { case (w, p) =>
        val wArr = s"array(${w.mkString("L, ")}L)"
        val proj = expr(s"aggregate(zip_with($wArr, v, (x, y) -> x * y), 0L, (acc, e) -> acc + e)")
        when(proj >= 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      v.select(bucket.cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }
  )
}
