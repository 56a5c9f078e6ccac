package graft.core

import java.security.MessageDigest

/** A 60-bit hash computable identically in Spark SQL, DuckDB SQL and on the
  * JVM, used wherever a derived column must be reproducible by the DuckDB
  * oracle: `h60(s) = first 15 hex digits of md5(s), read base-16`.
  *
  *   Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * 15 hex digits = 60 bits, always positive, no overflow ambiguity.
  */
object PortableHash {
  def h60(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Spark SQL expression text for h60 of an expression. */
  def sparkSql(expr: String): String =
    s"CAST(conv(substr(md5($expr), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB SQL expression text for h60 of an expression. */
  def duckSql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  // --- geotag derivation (BASELINE.json: geotag = pure function of the
  // phash-salted image id, in the reference's 1e-7 deg fixed-point space) ---

  val LonMod = 3600000001L // maps into [-1_800_000_000, 1_800_000_000]
  val LatMod = 1800000001L // maps into [-900_000_000, 900_000_000]

  def geoLon(imageId: String, phash: Long): Int =
    (h60(s"lon:$imageId:$phash") % LonMod - 1800000000L).toInt

  def geoLat(imageId: String, phash: Long): Int =
    (h60(s"lat:$imageId:$phash") % LatMod - 900000000L).toInt

  def phashOf(imageId: String): Long = h60(s"p:$imageId")
}
