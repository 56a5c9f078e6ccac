package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AudioCodec

/** Kernel tests for the deterministic audio codec backing the m_audio_*
  * operators: lossless round-trip byte-exactness, the lossy SNR >= 40 dB
  * invariant, header round-trip, and decimation arithmetic.
  */
class AudioSpec extends AnyFunSuite {

  test("pcm16 round-trips exactly") {
    for (id <- Seq("audA", "audB", "aud42#x")) {
      val truth = AudioCodec.samples(id, 1500)
      val (sr, got) = AudioCodec.decode(AudioCodec.encode("pcm16", id, 16000, 1500))
      assert(sr == 16000)
      assert(got.length == 1500)
      assert(java.util.Arrays.equals(truth.map(_.toInt), got.map(_.toInt)))
      assert(AudioCodec.snr(truth, got).isPosInfinity)
    }
  }

  test("q8 lossy decode meets the SNR >= 40 dB invariant") {
    for (id <- Seq("audA", "audB", "aud0", "aud999")) {
      val n = 2048
      val truth = AudioCodec.samples(id, n)
      val (sr, got) = AudioCodec.decode(AudioCodec.encode("q8", id, 8000, n))
      assert(sr == 8000)
      assert(got.length == n)
      val s = AudioCodec.snr(truth, got)
      assert(s >= 40.0, s"SNR $s below invariant for $id")
      // midpoint reconstruction: per-sample error strictly bounded by the
      // quantization step
      truth.zip(got).foreach { case (t, g) => assert(math.abs(t - g) <= 128) }
    }
  }

  test("samples are a pure function of the id (deterministic, id-sensitive)") {
    val a1 = AudioCodec.samples("audX", 512)
    val a2 = AudioCodec.samples("audX", 512)
    val b = AudioCodec.samples("audY", 512)
    assert(java.util.Arrays.equals(a1.map(_.toInt), a2.map(_.toInt)))
    assert(!java.util.Arrays.equals(a1.map(_.toInt), b.map(_.toInt)))
    // a longer clip extends the shorter one (chain property)
    val long = AudioCodec.samples("audX", 1024)
    assert(java.util.Arrays.equals(long.take(512).map(_.toInt), a1.map(_.toInt)))
  }

  test("header carries sample rate and count through both formats") {
    for ((fmt, sr, n) <- Seq(("pcm16", 8000, 1024), ("q8", 16000, 3071))) {
      val (dsr, pcm) = AudioCodec.decode(AudioCodec.encode(fmt, "hdr", sr, n))
      assert(dsr == sr && pcm.length == n)
    }
  }

  test("full-range extremes survive the q8 quantizer") {
    // recon(quant(s)) must stay within the int16 domain at both extremes
    val extremes = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    val enc = AudioCodec.encode("q8", "ext", 8000, 16)
    // direct check through a synthetic id is not possible for fixed values,
    // so verify the arithmetic identity on the decoded chain instead:
    val (_, got) = AudioCodec.decode(enc)
    got.foreach(v => assert(v >= Short.MinValue && v <= Short.MaxValue))
    // and the quant/recon identity on the extreme values via a manual pass
    extremes.foreach { s =>
      val q = (s >> 8).toByte
      val r = (((q & 0xff) << 8 | 0x80) << 16 >> 16).toShort
      assert(math.abs(s - r) <= 128, s"extreme $s -> $r")
    }
  }
}
