package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The audio fingerprint must read energy structure, not bytes: a
  * re-gained (volume-scaled) copy of a clip fingerprints IDENTICALLY
  * (sign-of-delta comparisons are gain-invariant by construction)
  * even though its bytes and byte-fingerprint differ; a clip with a
  * different energy envelope lands far away; and the shared banded
  * scan pairs exactly the re-mastered copy while corrupt payloads
  * drop silently. */
class AudioFingerprintSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def wav(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A clip whose per-segment energy follows a seed-dependent shape:
    * 130 segments of 40 samples, each a constant-amplitude burst. */
  private def clip(seed: Int, gainPct: Int = 100): Array[Short] = {
    def amp(seg: Int): Double =
      2000.0 + 1500.0 * math.sin(seed * 0.7 + seg * 0.9) +
        900.0 * math.cos(seed * 1.3 + seg * 2.1)
    Array.tabulate(130 * 40) { i =>
      val a = amp(i / 40) * gainPct / 100.0
      ((if ((i / 4) % 2 == 0) a else -a)).round.toShort
    }
  }

  test("gain-scaling preserves the fingerprint; a different envelope " +
      "lands far; bytes differ so only the PERCEPTUAL hash pairs them") {
    val full = wav(clip(1))
    val quiet = wav(clip(1, gainPct = 40))
    val other = wav(clip(9))
    full should not equal quiet // bytes genuinely differ
    Media.audioFingerprint(full) shouldBe Media.audioFingerprint(quiet)
    // well beyond the banded scan's pairing threshold (Hamming <= 7)
    Media.hamming64(Media.audioFingerprint(full),
      Media.audioFingerprint(other)) should be > Media.PhashMaxHamming
  }

  test("the banded scan pairs the re-gained copy and drops corrupt " +
      "payloads") {
    import spark.implicits._
    val objs = Seq(
      Media.MediaObject("a.wav", "audio", wav(clip(1))),
      Media.MediaObject("a_quiet.wav", "audio", wav(clip(1, 40))),
      Media.MediaObject("b.wav", "audio", wav(clip(9))),
      Media.MediaObject("bad.wav", "audio",
        "RIFFxxxxWAVEnot-actually-audio".getBytes)).toDS()
    val pairs = Media.audioNearDupPairs(objs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    pairs shouldBe Array(("a.wav", "a_quiet.wav", 0L))
  }
}
