package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual-hash (phash) image near-duplicate detection by band blocking.
  *
  * The standard trillion-scale blocking scheme for Hamming-space near-dup:
  * split the 60-bit phash into `nBands` contiguous bit bands; two images
  * within Hamming distance `maxHamming < nBands` must agree exactly on at
  * least one band (pigeonhole), so an equi-join per band finds every such
  * pair without any all-pairs comparison. Candidates are confirmed with the
  * full `bit_count(xor)` distance — everything stays in native codegen'd
  * bit arithmetic (no UDFs), and the per-band bucket join is a plain
  * shuffle equi-join that partitions by bucket at any scale.
  *
  * Degenerate buckets (a viral/black-frame phash shared by millions of
  * images) are quadratic within the bucket, so buckets larger than
  * `bucketCap` are dropped from candidate generation — the same guarded-
  * blocking rule as the MinHash LSH path ([[DocQueries.cappedBuckets]]),
  * mirrored exactly in the DuckDB oracle.
  */
object PhashDup {

  /** Default geometry: 4 bands x 15 bits covers the 60-bit phash; finds
    * every pair with Hamming distance <= 3 (pigeonhole over 4 bands). */
  val Bands = 4
  val BandBits = 15
  val MaxHamming = 3
  val BucketCap = 256

  /** Near-dup pairs (id_a < id_b, Hamming <= maxHamming) over a
    * (image_id, phash) frame. Output: (id_a, id_b, hamming BIGINT). */
  def apply(corpus: DataFrame, nBands: Int = Bands, bandBits: Int = BandBits,
            maxHamming: Int = MaxHamming, bucketCap: Int = BucketCap): DataFrame = {
    require(maxHamming < nBands, "pigeonhole guarantee needs maxHamming < nBands")
    // LONG bucket key (band index in the high bits): compact through the
    // shuffle — a string key would double the exchange volume for nothing
    val bandCols = (0 until nBands).map { b =>
      (shiftrightunsigned(col("phash"), b * bandBits)
        .bitwiseAND(lit((1L << bandBits) - 1)) + lit(b.toLong << bandBits)).as(s"b$b")
    }
    val bands = corpus.select(col("image_id"), col("phash"),
      explode(array(bandCols: _*)).as("bucket"))
    val bc = DocQueries.cappedBuckets(bands, "bucket", bucketCap)
    val cand = bc.as("x").join(bc.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.image_id") < col("y.image_id"))
      .select(col("x.image_id").as("id_a"), col("y.image_id").as("id_b"),
        col("x.phash").as("pa"), col("y.phash").as("pb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
