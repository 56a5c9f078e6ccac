package graft.sources

import java.security.MessageDigest

/** Deterministic image payloads and the two container formats used by the
  * engine's multimodal path. Real image libraries are unavailable in this
  * environment, so "decode" operates on our own deterministic formats; the
  * Spark-side plumbing (binary columns, mapPartitions batch decode, schema)
  * is the real thing.
  *
  * Formats (both carry a 1-byte tag + width/height as big-endian int16):
  *   raw  — lossless: tag 0, then w*h*3 RGB bytes verbatim.
  *   qrle — lossy:    tag 1, then run-length-encoded 5-bit-quantized bytes.
  *          5-bit quantization with midpoint reconstruction keeps
  *          PSNR ~= 40.7 dB on arbitrary payloads (>= the 40 dB invariant).
  */
object ImageCodec {

  /** Ground-truth pixels: an md5 chain keyed by image_id — pure function of
    * the id, reproducible anywhere without external data.
    */
  def pixels(imageId: String, w: Int, h: Int): Array[Byte] = {
    val n = w * h * 3
    val out = new Array[Byte](n)
    val md = MessageDigest.getInstance("MD5")
    var off = 0
    var block = 0
    while (off < n) {
      md.reset()
      md.update(imageId.getBytes("UTF-8"))
      md.update(':'.toByte)
      md.update(block.toString.getBytes("UTF-8"))
      val d = md.digest()
      val take = math.min(16, n - off)
      System.arraycopy(d, 0, out, off, take)
      off += take
      block += 1
    }
    out
  }

  private def quant(b: Byte): Int = (b & 0xff) >> 3
  // midpoint reconstruction: uniform-error mse = 5.5 => PSNR ~= 40.7 dB
  private def recon(q: Int): Byte = (((q << 3) + 4) & 0xff).toByte

  def encode(fmt: String, imageId: String, w: Int, h: Int): Array[Byte] = {
    val px = pixels(imageId, w, h)
    val head = Array[Byte](if (fmt == "raw") 0 else 1,
      (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte)
    fmt match {
      case "raw" => head ++ px
      case "qrle" =>
        val buf = new scala.collection.mutable.ArrayBuffer[Byte](px.length / 2)
        var i = 0
        while (i < px.length) {
          val q = quant(px(i))
          var run = 1
          while (i + run < px.length && run < 255 && quant(px(i + run)) == q) run += 1
          buf += run.toByte
          buf += q.toByte
          i += run
        }
        head ++ buf
      case other => throw new IllegalArgumentException(s"unknown fmt $other")
    }
  }

  /** Decode either format back to RGB bytes; returns (w, h, pixels). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val tag = bytes(0)
    val w = ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
    val h = ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val n = w * h * 3
    val out = new Array[Byte](n)
    if (tag == 0) {
      System.arraycopy(bytes, 5, out, 0, n)
    } else {
      var i = 5
      var off = 0
      while (off < n) {
        val run = bytes(i) & 0xff
        val v = recon(bytes(i + 1) & 0xff)
        var j = 0
        while (j < run) { out(off + j) = v; j += 1 }
        off += run
        i += 2
      }
    }
    (w, h, out)
  }

  /** Peak signal-to-noise ratio in dB; infinity for identical payloads. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "payload size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * a.length / se)
  }
}
