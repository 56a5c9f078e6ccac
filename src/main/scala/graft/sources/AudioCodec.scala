package graft.sources

import java.security.MessageDigest

/** Deterministic audio payloads and the two container formats used by the
  * engine's audio path — the audio sibling of [[ImageCodec]]. Real audio
  * libraries are unavailable in this environment, so "decode" operates on
  * our own deterministic formats; the Spark-side plumbing (binary columns,
  * mapPartitions batch decode, framing, schema) is the real thing.
  *
  * Formats (both carry a 1-byte tag + sample rate as big-endian int16 +
  * sample count as big-endian int32):
  *   pcm16 — lossless: tag 0, then n big-endian int16 samples verbatim.
  *   q8    — lossy:    tag 1, then n bytes of 8-bit-quantized samples.
  *           Quantization keeps top 8 bits with midpoint reconstruction:
  *           SNR ~= 48 dB on full-range payloads (>= the 40 dB invariant).
  */
object AudioCodec {

  /** Ground-truth samples: an md5 chain keyed by audio_id — pure function
    * of the id, reproducible anywhere without external data. Bytes pair up
    * little-endian into signed 16-bit PCM.
    */
  def samples(audioId: String, n: Int): Array[Short] = {
    val bytes = new Array[Byte](n * 2)
    val md = MessageDigest.getInstance("MD5")
    var off = 0
    var block = 0
    while (off < bytes.length) {
      md.reset()
      md.update(audioId.getBytes("UTF-8"))
      md.update('#'.toByte)
      md.update(block.toString.getBytes("UTF-8"))
      val d = md.digest()
      val take = math.min(16, bytes.length - off)
      System.arraycopy(d, 0, bytes, off, take)
      off += take
      block += 1
    }
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  private def quant(s: Short): Byte = (s >> 8).toByte
  // midpoint reconstruction: uniform error in [-128,127] => SNR ~= 48 dB
  private def recon(q: Byte): Short = (((q & 0xff) << 8 | 0x80) << 16 >> 16).toShort

  def encode(fmt: String, audioId: String, sr: Int, n: Int): Array[Byte] = {
    val pcm = samples(audioId, n)
    val head = Array[Byte](if (fmt == "pcm16") 0 else 1,
      (sr >> 8).toByte, sr.toByte,
      (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
    fmt match {
      case "pcm16" =>
        val out = new Array[Byte](7 + n * 2)
        System.arraycopy(head, 0, out, 0, 7)
        var i = 0
        while (i < n) {
          out(7 + 2 * i) = (pcm(i) >> 8).toByte
          out(7 + 2 * i + 1) = pcm(i).toByte
          i += 1
        }
        out
      case "q8" =>
        val out = new Array[Byte](7 + n)
        System.arraycopy(head, 0, out, 0, 7)
        var i = 0
        while (i < n) { out(7 + i) = quant(pcm(i)); i += 1 }
        out
      case other => throw new IllegalArgumentException(s"unknown fmt $other")
    }
  }

  /** Decode either format; returns (sampleRate, samples). */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    val tag = bytes(0)
    val sr = ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
    val n = ((bytes(3) & 0xff) << 24) | ((bytes(4) & 0xff) << 16) |
      ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
    val out = new Array[Short](n)
    var i = 0
    if (tag == 0) {
      while (i < n) {
        out(i) = (((bytes(7 + 2 * i) & 0xff) << 8) | (bytes(7 + 2 * i + 1) & 0xff)).toShort
        i += 1
      }
    } else {
      while (i < n) { out(i) = recon(bytes(7 + i)); i += 1 }
    }
    (sr, out)
  }

  /** Signal-to-noise ratio in dB; infinity for identical payloads. */
  def snr(truth: Array[Short], got: Array[Short]): Double = {
    require(truth.length == got.length, "sample count mismatch")
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < truth.length) {
      val t = truth(i).toDouble
      val d = t - got(i)
      sig += t * t
      noise += d * d
      i += 1
    }
    if (noise == 0) Double.PositiveInfinity
    else 10.0 * math.log10(sig / noise)
  }
}
