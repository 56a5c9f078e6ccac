package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.EmbedQueries

/** Quality properties of the ANN scale path that the bit-exact oracle gate
  * can't express:
  *  - true duplicates are NEVER missed (identical vectors share every
  *    hyperplane bit, so they always meet in the probe-0 bucket and the
  *    exact dot ranks the duplicate first) — the guarantee the near-dup
  *    pipeline leans on;
  *  - measured recall vs the brute-force baseline on the real (near-random)
  *    embeddings, reported and floor-asserted. Random vectors are the
  *    WORST case for LSH (top-k is noise), so the floor is modest; real
  *    embedding corpora are clustered and bucket recall rises with them.
  */
class EmbedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ann = EmbedQueries.defs.find(_.name == "e_ann_topk").get
  def brute = EmbedQueries.defs.find(_.name == "e_topk_mips").get

  test("planted exact duplicates are always found at rank 1") {
    import spark.implicits._
    // 40 deterministic sign-pattern vectors; vec 25 duplicates vec 0 and
    // vec 30 duplicates vec 5 — both dups of query ids (vec_id % 25 == 0
    // picks 0 and 25; 0's dup is 25, 25's dup is 0)
    def pat(seed: Int): Seq[Float] = (0 until 64).map { d =>
      if (graft.core.PortableHash.h60(s"es:$seed:$d") % 2 == 0) 1.0f else -1.0f
    }
    val vecs = (0 until 40).map { i =>
      val base = if (i == 25) 0 else if (i == 30) 5 else i
      (i.toLong, pat(base), 0L)
    }
    val dir = Files.createTempDirectory("embedspec").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = ann.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // query 0 -> duplicate 25 at rank 1, and vice versa (dot = 64e6 >> rest)
    assert(got.contains((0L, 1L, 25L)), got.mkString(","))
    assert(got.contains((25L, 1L, 0L)), got.mkString(","))
  }

  test("recall vs brute force on the real embeddings, exact dots within bucket") {
    val dir = "/root/testdata/sf0.001"
    val a = ann.fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val b = brute.fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    // any (qid, pid) both report carries the SAME exact integer dot
    val shared = a.keySet intersect b.keySet
    assert(shared.forall(k => a(k) == b(k)))
    val recall = shared.size.toDouble / b.size
    info(f"ANN recall@3 vs brute force on near-random vectors: $recall%.2f (${shared.size}/${b.size})")
    assert(recall >= 0.05, f"recall collapsed: $recall%.2f")
  }
}
