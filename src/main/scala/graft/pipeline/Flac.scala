package graft.pipeline

/** Pure-JVM FLAC decoder (round-16 verdict task 6 — the one standing
  * functional hole in the media surface). Implements the public FLAC
  * bitstream format (RFC 9639 / xiph.org spec): STREAMINFO parsing,
  * frame sync + header CRC-8, all four subframe types (CONSTANT,
  * VERBATIM, FIXED orders 0–4, LPC orders 1–32), both Rice residual
  * methods (4- and 5-bit parameters, escape-coded raw partitions),
  * wasted bits, stereo decorrelation (left-side, right-side,
  * mid-side), and the frame CRC-16. No native code, no service
  * providers — a byte array in, per-channel PCM out — so the Media
  * audio path can treat `.flac` payloads exactly like RIFF/WAVE.
  *
  * The reference pipeline has no audio surface; this closes the
  * compressed-codec fence the multimodal extension carried since
  * round 13 (mp3/ogg/video remain honestly fenced: lossy codecs need
  * DSP stacks a 500-line decoder cannot responsibly fake).
  *
  * Determinism: FLAC is lossless — decode(encode(pcm)) == pcm exactly,
  * which is what `FlacSpec`'s golden round-trips pin (byte-level
  * bitstream fixture + cross-codec equality against the WAV path).
  */
object Flac {

  final case class FlacAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long,
      channelData: Array[Array[Int]])

  def isFlac(content: Array[Byte]): Boolean =
    content.length >= 4 && content(0) == 'f' && content(1) == 'L' &&
      content(2) == 'a' && content(3) == 'C'

  /** MSB-first bit reader with byte-position access for CRC spans. */
  private final class BitReader(data: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0 // bits consumed in data(bytePos), from MSB

    def atEnd: Boolean = bytePos >= data.length

    def readBit(): Int = {
      if (bytePos >= data.length)
        throw new IllegalArgumentException("flac: truncated stream")
      val b = (data(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L
      else if ((v & (1L << (n - 1))) != 0) v - (1L << n)
      else v
    }

    /** Count zero bits until the terminating 1 (Rice quotient). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }

    def byteAligned: Boolean = bitPos == 0
  }

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the frame-header
    * checksum. */
  private[pipeline] def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the whole-frame
    * checksum. */
  private[pipeline] def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** The UTF-8-style coded frame/sample number (spec: same prefix
    * scheme as UTF-8, extended to 7 continuation bytes / 36 bits). */
  private def readCodedNumber(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    var ones = 0
    while (ones < 8 && ((first << ones) & 0x80) != 0) ones += 1
    if (ones == 0) first.toLong
    else if (ones == 1 || ones > 7)
      throw new IllegalArgumentException("flac: invalid coded number")
    else {
      var v = (first & (0x7f >> ones)).toLong
      var i = 1
      while (i < ones) {
        val c = r.readBits(8).toInt
        if ((c & 0xc0) != 0x80)
          throw new IllegalArgumentException("flac: invalid coded number")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  private val FixedSampleRates: Map[Int, Int] = Map(
    1 -> 88200, 2 -> 176400, 3 -> 192000, 4 -> 8000, 5 -> 16000,
    6 -> 22050, 7 -> 24000, 8 -> 32000, 9 -> 44100, 10 -> 48000,
    11 -> 96000)

  private val SampleSizes: Map[Int, Int] = Map(
    1 -> 8, 2 -> 12, 4 -> 16, 5 -> 20, 6 -> 24, 7 -> 32)

  def decode(content: Array[Byte]): FlacAudio = {
    require(isFlac(content), "flac: missing fLaC stream marker")
    val r = new BitReader(content)
    r.readBits(32) // marker

    // Metadata blocks: STREAMINFO is mandatory and first.
    var last = false
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var sawStreamInfo = false
    while (!last) {
      last = r.readBit() == 1
      val blockType = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      if (blockType == 0) {
        sawStreamInfo = true
        r.readBits(16) // min block size
        r.readBits(16) // max block size
        r.readBits(24) // min frame size
        r.readBits(24) // max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        r.readBits(128) // md5 of unencoded audio (not verified here)
      } else {
        var i = 0
        while (i < len) { r.readBits(8); i += 1 }
      }
    }
    require(sawStreamInfo, "flac: STREAMINFO block missing")

    val out =
      Array.fill(channels)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var decoded = 0L
    while (decoded < totalSamples || (totalSamples == 0 && !r.atEnd)) {
      decoded += decodeFrame(content, r, sampleRate, channels, bps, out)
    }
    FlacAudio(sampleRate, channels, bps, totalSamples,
      out.map(_.toArray))
  }

  /** Decode one frame into `out`; returns its block size. */
  private def decodeFrame(content: Array[Byte], r: BitReader,
      siRate: Int, siChannels: Int, siBps: Int,
      out: Array[scala.collection.mutable.ArrayBuffer[Int]]): Int = {
    require(r.byteAligned, "flac: frame not byte-aligned")
    val frameStart = r.bytePos
    val sync = r.readBits(14)
    require(sync == 0x3ffe, "flac: lost frame sync")
    r.readBit() // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chCode = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    r.readBit() // reserved
    readCodedNumber(r)
    val blockSize = bsCode match {
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case n if n >= 8 => 256 << (n - 8)
      case _ => throw new IllegalArgumentException("flac: reserved block size")
    }
    srCode match {
      case 0 => // from STREAMINFO
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case n if FixedSampleRates.contains(n) =>
      case _ => throw new IllegalArgumentException("flac: invalid sample rate")
    }
    val headerEnd = r.bytePos
    val expectedCrc8 = r.readBits(8).toInt
    require(crc8(content, frameStart, headerEnd) == expectedCrc8,
      "flac: frame header CRC-8 mismatch")

    val bps = if (ssCode == 0) siBps
      else SampleSizes.getOrElse(ssCode,
        throw new IllegalArgumentException("flac: reserved sample size"))
    val nCh = if (chCode < 8) chCode + 1 else 2
    require(nCh == siChannels, "flac: channel count mismatch")

    // Subframes: the SIDE channel of a decorrelated pair carries one
    // extra bit of precision.
    val chans = Array.ofDim[Array[Int]](nCh)
    var ch = 0
    while (ch < nCh) {
      val extra = chCode match {
        case 8 => if (ch == 1) 1 else 0 // left-side: ch1 = side
        case 9 => if (ch == 0) 1 else 0 // right-side: ch0 = side
        case 10 => if (ch == 1) 1 else 0 // mid-side: ch1 = side
        case _ => 0
      }
      chans(ch) = decodeSubframe(r, blockSize, bps + extra)
      ch += 1
    }
    r.alignToByte()
    val frameEnd = r.bytePos
    val expectedCrc16 = r.readBits(16).toInt
    require(crc16(content, frameStart, frameEnd) == expectedCrc16,
      "flac: frame CRC-16 mismatch")

    // Undo stereo decorrelation.
    chCode match {
      case 8 => // left-side: right = left - side
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // right-side: left = side + right
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i)
          chans(0)(i) = side + chans(1)(i); i += 1
        }
      case 10 => // mid-side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          var mid = chans(0)(i)
          mid = (mid << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ =>
    }
    var c = 0
    while (c < nCh) { out(c) ++= chans(c); c += 1 }
    blockSize
  }

  private def decodeSubframe(r: BitReader, blockSize: Int,
      bps: Int): Array[Int] = {
    require(r.readBit() == 0, "flac: subframe padding bit set")
    val typeCode = r.readBits(6).toInt
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    val s = new Array[Int](blockSize)
    if (typeCode == 0) { // CONSTANT
      val v = r.readSigned(effBps).toInt
      java.util.Arrays.fill(s, v)
    } else if (typeCode == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = r.readSigned(effBps).toInt; i += 1 }
    } else if ((typeCode & 0x38) == 0x08 && (typeCode & 0x07) <= 4) {
      // FIXED, order 0-4
      val order = typeCode & 0x07
      var i = 0
      while (i < order) { s(i) = r.readSigned(effBps).toInt; i += 1 }
      val res = decodeResidual(r, blockSize, order)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0L
          case 1 => s(i - 1).toLong
          case 2 => 2L * s(i - 1) - s(i - 2)
          case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
          case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
        }
        s(i) = (p + res(i - order)).toInt
        i += 1
      }
    } else if ((typeCode & 0x20) != 0) { // LPC, order 1-32
      val order = (typeCode & 0x1f) + 1
      var i = 0
      while (i < order) { s(i) = r.readSigned(effBps).toInt; i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, "flac: invalid qlp precision")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, "flac: negative qlp shift")
      val coefs = Array.fill(order)(r.readSigned(precision).toInt)
      val res = decodeResidual(r, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
        s(i) = ((acc >> shift) + res(i - order)).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(
      s"flac: reserved subframe type $typeCode")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice-coded residual: method 0 = 4-bit parameters (escape 0b1111),
    * method 1 = 5-bit parameters (escape 0b11111); escape → raw n-bit
    * signed samples. */
  private def decodeResidual(r: BitReader, blockSize: Int,
      order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, "flac: reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    require(blockSize % parts == 0 && (blockSize >> partOrder) > order,
      "flac: invalid partition order")
    val res = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { res(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val low = r.readBits(param)
          val v = (q << param) | low
          res(idx) = (v >>> 1) ^ -(v & 1L) // zigzag
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    res
  }

  /** Interleave per-channel data to the canonical 16-bit PCM the WAV
    * path emits — the Media seam's common currency. Shifts narrower or
    * wider sample sizes to 16-bit. */
  def toPcm16(a: FlacAudio): Array[Short] = {
    val n = if (a.channelData.isEmpty) 0 else a.channelData(0).length
    val outArr = new Array[Short](n * a.channels)
    val shift = a.bitsPerSample - 16
    var i = 0
    while (i < n) {
      var c = 0
      while (c < a.channels) {
        val v = a.channelData(c)(i)
        outArr(i * a.channels + c) =
          (if (shift >= 0) v >> shift else v << -shift).toShort
        c += 1
      }
      i += 1
    }
    outArr
  }
}
