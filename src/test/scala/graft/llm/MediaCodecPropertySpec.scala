package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the byte-level media codecs: encode∘decode is the
  * identity for ARBITRARY payloads (not just the corpus generator's),
  * resize dimensions always hold, and malformed bytes fail loudly rather
  * than decoding to wrong data. Pure JVM — no Spark session. Plain
  * scalacheck Gen with fixed seeds (scalatestplus isn't in the offline
  * cache — same pattern as MeterPropertySpec).
  */
class MediaCodecPropertySpec extends AnyFunSuite {
  import MediaCodec._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val dims = Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40))

  test("PPM encode/decode round-trips arbitrary pixel data and dims") {
    samples(Gen.zip(dims, Gen.long), 25).foreach { case ((w, h), seed) =>
      val px = Array.tabulate(w * h * 3)(i =>
        (((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 33) & 0xff).toInt)
      val bytes = encodePpm(w, h, i => px(i.toInt))
      val (img, next) = decodePpm(bytes, 0)
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(next == bytes.length)
      assert(img.values.map(_ & 0xff).toSeq == px.toSeq, s"pixels w=$w h=$h")
    }
  }

  test("WAV encode/decode round-trips arbitrary PCM16 samples") {
    samples(Gen.zip(Gen.choose(0, 500), Gen.long), 25).foreach { case (n, seed) =>
      val pcm = Array.tabulate(n)(i =>
        ((seed * 2862933555777941757L + i * 3037000493L) >> 40).toShort)
      val a = decodeWav(encodeWav(pcm, SampleRateHz))
      assert(a.sampleRate == SampleRateHz && a.channels == 1)
      assert(a.samples.toSeq == pcm.toSeq, s"n=$n")
    }
  }

  test("video container round-trips arbitrary frame lists") {
    samples(Gen.zip(dims, Gen.choose(0, 6), Gen.long), 20).foreach {
      case ((w, h), nf, seed) =>
        val frames = (0 until nf).map(f =>
          encodePpm(w, h, i => ((seed + f * 131 + i * 7) & 0xff).toInt))
        val out = decodeVideo(encodeVideo(frames))
        assert(out.length == nf)
        out.zipWithIndex.foreach { case (img, f) =>
          assert(img.width == w && img.height == h)
          assert((img.values(0) & 0xff) == ((seed + f * 131) & 0xff).toInt)
        }
    }
  }

  test("resize output always has the target dims and samples source pixels") {
    samples(Gen.zip(dims, dims), 25).foreach { case ((sw, sh), (ow, oh)) =>
      val src = Image(sw, sh, 3, Array.tabulate(sw * sh * 3)(i => (i % 251).toByte))
      val out = resize(src, ow, oh)
      assert(out.width == ow && out.height == oh)
      assert(out.values.length == ow * oh * 3)
      // every output pixel value is a real source pixel value (nearest neighbor)
      val srcSet = src.values.toSet
      assert(out.values.forall(srcSet.contains), s"($sw,$sh)->($ow,$oh)")
    }
  }

  test("audio fingerprint is volume-invariant (envelope comparisons, not magnitudes)") {
    samples(Gen.choose(0L, 5000L), 15).foreach { idRaw =>
      val id = idRaw * 3 + 1 // audio modality
      val a = decodeWav(audioFor(id))
      val louder = Audio(a.sampleRate, a.channels, a.samples.map(s => (s * 2).toShort))
      assert(audioFingerprint28(a) == audioFingerprint28(louder),
        s"doubling amplitude changed the fingerprint for doc $id")
    }
  }

  test("truncated or garbled payloads fail loudly, never return wrong data") {
    val good = imageFor(3L)
    intercept[Exception](decodePpm(good.dropRight(5), 0)) // truncated pixel data
    intercept[Exception](decodePpm("XY".getBytes ++ good, 0)) // bad magic
    intercept[Exception](decodeWav(audioFor(1L).take(10))) // truncated header
    intercept[Exception](decodeVideo(videoFor(2L).drop(2))) // shifted magic
  }
}
