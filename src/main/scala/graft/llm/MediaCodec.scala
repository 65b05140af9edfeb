package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Byte-level media codecs for the multimodal corpus: P6 PPM images,
  * RIFF/WAVE PCM16 mono audio, and a minimal framed-video container
  * (`GRV0` magic + big-endian frame count + concatenated PPM frames).
  *
  * These are REAL formats with real parsers — any external PPM/WAV reader
  * decodes the generated payloads, and the decoders below parse arbitrary
  * conforming bytes (they never look at `doc_id`). Generation is
  * deterministic `doc_id` arithmetic, so every decoded statistic (dims,
  * frame counts, pixel/sample sums, byte sizes) has a closed form the
  * DuckDB oracle can state — the decode stage is verified end-to-end
  * against SQL, not trusted.
  *
  * Reference parity: the reference pipeline treats payloads as opaque
  * blobs next to typed metadata; this module supplies the codec-backed
  * decode/resize/frame-sample stages a training-data pipeline needs on
  * top of that (reference `consumer/meter_consumer.py:61-78` validates
  * decoded wire payloads the same parse-then-verify way).
  */
object MediaCodec {

  // ---- deterministic content parameters (mirrored in the oracle SQL) ----
  def imgW(id: Long): Int = (id % 13 + 2).toInt
  def imgH(id: Long): Int = (id % 7 + 2).toInt
  /** Pixel byte `i` of frame `f`: (id·31 + f·97 + i) mod 256. */
  def pixelAt(id: Long, frame: Int, i: Long): Int =
    ((id * 31 + frame * 97L + i) % 256).toInt
  def nSamples(id: Long): Int = (id % 200 + 50).toInt
  /** PCM sample `i`: (id·7 + i·13) mod 4096 − 2048 ∈ [−2048, 2047]. */
  def sampleAt(id: Long, i: Long): Int = ((id * 7 + i * 13) % 4096 - 2048).toInt
  def nFrames(id: Long): Int = (id % 4 + 1).toInt

  val SampleRateHz = 8000
  val VideoFps = 4

  def modalityOf(id: Long): String =
    (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }

  // ======================= PPM (P6, maxval 255) =======================

  /** Encode a P6 PPM: `P6\n<w> <h>\n255\n` + w·h·3 raw RGB bytes. */
  def encodePpm(w: Int, h: Int, value: Long => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = value(i.toLong).toByte; i += 1 }
    out
  }

  final case class Image(width: Int, height: Int, channels: Int, values: Array[Byte]) {
    def valueSum: Long = {
      var s = 0L; var i = 0
      while (i < values.length) { s += values(i) & 0xff; i += 1 }
      s
    }
  }

  /** Parse one P6 image starting at `off`; returns it plus the offset one
    * past its pixel data (so concatenated frames parse sequentially). */
  def decodePpm(bytes: Array[Byte], off: Int): (Image, Int) = {
    require(off + 2 <= bytes.length && bytes(off) == 'P' && bytes(off + 1) == '6',
      "not a P6 PPM")
    var p = off + 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def readInt(): Int = {
      while (p < bytes.length && isWs(bytes(p))) p += 1
      require(p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9',
        "truncated PPM header")
      var v = 0
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0'); p += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    require(w > 0 && h > 0, s"degenerate PPM dimensions ${w}x$h")
    require(maxv == 255, s"unsupported maxval $maxv")
    p += 1 // exactly one whitespace byte separates maxval from pixel data
    val n = w * h * 3
    // copyOfRange zero-pads past the array end — reject truncation instead
    require(p + n <= bytes.length,
      s"truncated PPM: need $n pixel bytes at offset $p, have ${bytes.length - p}")
    val img = Image(w, h, 3, java.util.Arrays.copyOfRange(bytes, p, p + n))
    (img, p + n)
  }

  /** Nearest-neighbor resize: out(x, y) = src(⌊x·w/ow⌋, ⌊y·h/oh⌋). */
  def resize(img: Image, ow: Int, oh: Int): Image = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * img.height / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * img.width / ow).toInt
        val si = (sy * img.width + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = img.values(si)
        out(di + 1) = img.values(si + 1)
        out(di + 2) = img.values(si + 2)
        x += 1
      }
      y += 1
    }
    Image(ow, oh, 3, out)
  }

  // ==================== WAV (RIFF, PCM16 mono LE) ====================

  def encodeWav(samples: Array[Short], rateHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(rateHz); bb.putInt(rateHz * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes(US_ASCII)); bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def valueSum: Long = {
      var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i); i += 1 }
      s
    }
  }

  /** Chunk-walking RIFF parser (fmt + data; other chunks skipped). */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, US_ASCII)
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    bb.getInt // riff payload length
    require(fourcc() == "WAVE", "not a WAVE file")
    var rate = 0; var ch = 0
    var samples: Array[Short] = Array.emptyShortArray
    while (bb.remaining() >= 8) {
      val id = fourcc(); val len = bb.getInt
      if (id == "fmt ") {
        val fmt = bb.getShort; ch = bb.getShort.toInt
        rate = bb.getInt; bb.getInt; bb.getShort
        val bits = bb.getShort
        require(fmt == 1 && bits == 16, s"unsupported wav encoding fmt=$fmt bits=$bits")
        if (len > 16) bb.position(bb.position() + len - 16)
      } else if (id == "data") {
        samples = new Array[Short](len / 2)
        var i = 0
        while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
      } else {
        bb.position(bb.position() + len)
      }
      // RIFF chunks are word-aligned: an odd payload carries one pad byte
      if ((len & 1) == 1 && bb.remaining() > 0) bb.position(bb.position() + 1)
    }
    Audio(rate, ch, samples)
  }

  // ============ framed video: GRV0 + count + PPM frames ============

  val VideoMagic = "GRV0"

  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + frames.map(_.length).sum) // big-endian
    bb.put(VideoMagic.getBytes(US_ASCII)); bb.putInt(frames.length)
    frames.foreach(bb.put)
    bb.array()
  }

  def decodeVideo(bytes: Array[Byte]): IndexedSeq[Image] = {
    require(bytes.length >= 8 && new String(bytes, 0, 4, US_ASCII) == VideoMagic,
      "not a GRV0 stream")
    val n = ByteBuffer.wrap(bytes, 4, 4).getInt
    require(n >= 0, s"corrupt GRV0 frame count $n") // negative = garbled header
    var off = 8
    (0 until n).map { _ =>
      val (img, next) = decodePpm(bytes, off); off = next; img
    }
  }

  // ===================== perceptual hashing =====================

  /** 56-bit difference hash (dHash) of an image: nearest-neighbor resize
    * to an 8×8 grayscale grid, one bit per adjacent-pixel brightness
    * comparison (7 per row × 8 rows). 56 bits keeps every shift inside a
    * non-negative BIGINT — the property the SQL oracle twin needs.
    * Near-duplicate images differ in few bits; a single-pixel edit flips
    * at most 2. */
  def dHash56(img: Image): Long = {
    val g = resize(img, 8, 8)
    def gray(x: Int, y: Int): Int = {
      val i = (y * 8 + x) * 3
      ((g.values(i) & 0xff) + (g.values(i + 1) & 0xff) + (g.values(i + 2) & 0xff)) / 3
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (gray(x + 1, y) > gray(x, y)) h |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 28-bit audio fingerprint: 29 evenly-spaced 8-sample windows over the
    * decoded PCM, one bit per adjacent-window energy comparison (energy =
    * Σ|sample|, an exact integer — so the SQL oracle twin reproduces the
    * hash bit-for-bit). The audio analogue of [[dHash56]]: robust to
    * amplitude-preserving edits, cheap to band into bucket joins. */
  def audioFingerprint28(a: Audio): Long = {
    val ns = a.samples.length
    def energy(b: Int): Long = {
      val p = b * ns / 29
      val end = math.min(p + 8, ns)
      var s = 0L
      var j = p
      while (j < end) { s += math.abs(a.samples(j).toLong); j += 1 }
      s
    }
    var h = 0L
    var b = 0
    while (b < 28) {
      if (energy(b + 1) > energy(b)) h |= 1L << b
      b += 1
    }
    h
  }

  // ===================== per-document generation =====================

  def imageFor(id: Long): Array[Byte] =
    encodePpm(imgW(id), imgH(id), i => pixelAt(id, 0, i))

  def audioFor(id: Long): Array[Byte] =
    encodeWav(Array.tabulate(nSamples(id))(i => sampleAt(id, i.toLong).toShort), SampleRateHz)

  def videoFor(id: Long): Array[Byte] =
    encodeVideo((0 until nFrames(id)).map(f => encodePpm(imgW(id), imgH(id), i => pixelAt(id, f, i))))

  def mediaFor(id: Long): Array[Byte] =
    (id % 3) match { case 0 => imageFor(id); case 1 => audioFor(id); case _ => videoFor(id) }
}
