package graft.ops

import java.io.ByteArrayOutputStream

/** Pure-JVM FLAC codec (RFC 9639 / the xiph format spec) — the compressed
  * lane of the audio pipeline, next to [[Adpcm]]'s WAV-side codecs.
  *
  * Why FLAC and not MP3/AAC for the "compressed audio payload" slot: FLAC
  * is defined entirely by algorithmic math — Rice/unary entropy codes,
  * fixed polynomial + LPC predictors, CRC-8/16, stereo decorrelation —
  * with ZERO normative tabulated data, so it is implementable offline and,
  * critically, VERIFIABLE offline: the STREAMINFO block embeds an MD5 of
  * the unencoded PCM, so a decode that reproduces the signed hash is
  * validated by the format's own integrity mechanism (this repo's codec
  * policy: every codec ships with an in-container cross-check — JPEG vs
  * ImageIO, µ-law vs javax.sound, tar vs GNU tar). MP3 Layer III's
  * Huffman tables / synthesis window / scalefactor bands are normative
  * *tables* (ISO 11172-3 B.3/B.7/B.8) that cannot be derived and are not
  * present in this container, and no independent decoder exists here to
  * validate a reproduction — so MP3/AAC stay header-only by policy
  * ([[Multimodal.avHeaderMeta]]), explicitly out of scope. FLAC is also
  * the dominant format of real speech corpora (LibriSpeech, MLS), so a
  * training-data pipeline hits it constantly.
  *
  * Decoder: full subset-independent support — CONSTANT / VERBATIM / FIXED
  * (orders 0–4) / LPC (orders 1–32) subframes, both Rice methods (4- and
  * 5-bit parameters) with partitions and escape codes, wasted bits, all
  * four channel assignments, CRC-8 + CRC-16 verified, frame-header coded
  * numbers in the 36-bit extended-UTF-8 form. Encoder: fixed + real LPC
  * (Levinson–Durbin, quantized coefficients) with per-frame stereo-mode
  * and per-subframe predictor selection by estimated cost — chosen so
  * round-trips exercise every decoder path. Lossless: decode(encode(x))
  * == x exactly, and the embedded MD5 matches (FlacSpec pins both).
  */
object Flac {

  final case class Audio(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Array[Int]], md5Match: Option[Boolean])

  // ---------------- CRCs (polynomials are part of the format) ----------
  private[ops] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[ops] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------- bit IO (MSB-first, as the format reads) ------------
  private final class BitReader(val bytes: Array[Byte]) {
    var pos = 0 // byte position
    var bit = 0 // bits consumed in current byte
    def readBit(): Int = {
      if (pos >= bytes.length) throw new IndexOutOfBoundsException("flac eof")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = read(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalStateException("unary runaway")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def writeBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1)
      nAcc += 1
      if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
    }
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nAcc != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // 36-bit extended UTF-8 coded number (frame/sample index). A k-byte
  // encoding carries 7 bits (k=1), 5k+1 bits (k=2..6), or 36 bits (k=7):
  // header byte = k ones, a zero, then 7-k payload bits; continuations
  // are 10xxxxxx.
  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    def capacity(k: Int) = if (k == 1) 7 else if (k == 7) 36 else 5 * k + 1
    var k = 1
    while (k < 7 && v >= (1L << capacity(k))) k += 1
    if (k == 1) { w.write(v, 8); return }
    val topBits = if (k == 7) 0 else 7 - k
    val hdr = (0xFF00 >> k) & 0xFF
    val top =
      if (topBits > 0) ((v >> (6 * (k - 1))) & ((1L << topBits) - 1)).toInt
      else 0
    w.write(hdr | top, 8)
    var i = k - 2
    while (i >= 0) {
      w.write(0x80L | ((v >> (6 * i)) & 0x3F), 8)
      i -= 1
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.read(8).toInt
    if ((b0 & 0x80) == 0) return b0
    var nBytes = 0
    var mask = 0x80
    while ((b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
    if (nBytes < 2 || nBytes > 7) throw new IllegalStateException("bad coded number")
    var v: Long = if (nBytes == 7) 0L else (b0 & (0x7F >> nBytes)).toLong
    var i = 1
    while (i < nBytes) {
      val b = r.read(8).toInt
      if ((b & 0xC0) != 0x80) throw new IllegalStateException("bad continuation")
      v = (v << 6) | (b & 0x3F)
      i += 1
    }
    v
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // common block-size codes (code -> size); 0110/0111 are the explicit forms
  private val BlockSizeCodes: Map[Int, Int] = Map(
    1 -> 192, 2 -> 576, 3 -> 1152, 4 -> 2304, 5 -> 4608,
    8 -> 256, 9 -> 512, 10 -> 1024, 11 -> 2048, 12 -> 4096,
    13 -> 8192, 14 -> 16384, 15 -> 32768)

  private val SampleRateCodes: Map[Int, Int] = Map(
    1 -> 88200, 2 -> 176400, 3 -> 192000, 4 -> 8000, 5 -> 16000,
    6 -> 22050, 7 -> 24000, 8 -> 32000, 9 -> 44100, 10 -> 48000, 11 -> 96000)

  private val SampleSizeCodes: Map[Int, Int] =
    Map(1 -> 8, 2 -> 12, 4 -> 16, 5 -> 20, 6 -> 24, 7 -> 32)

  // ---------------- decode ---------------------------------------------
  /** Full decode. None on anything malformed (never throws — the fuzz
    * posture every codec here meets). `md5Match` is Some(ok) when the
    * STREAMINFO carried a non-zero MD5 and bps is byte-aligned. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    try decodeUnsafe(bytes)
    catch { case _: Exception | _: StackOverflowError => None }
  }

  private def decodeUnsafe(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    var p = 4
    var sampleRate = 0; var channels = 0; var bps = 0; var totalSamples = 0L
    var md5 = new Array[Byte](16)
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) return None
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      p += 4
      if (p + len > bytes.length) return None
      if (btype == 0) { // STREAMINFO
        if (len < 34) return None
        val b = java.util.Arrays.copyOfRange(bytes, p, p + 34)
        sampleRate = ((b(10) & 0xff) << 12) | ((b(11) & 0xff) << 4) | ((b(12) & 0xff) >> 4)
        channels = ((b(12) >> 1) & 0x7) + 1
        bps = (((b(12) & 1) << 4) | ((b(13) & 0xff) >> 4)) + 1
        totalSamples = ((b(13) & 0xfL) << 32) | ((b(14) & 0xffL) << 24) |
          ((b(15) & 0xffL) << 16) | ((b(16) & 0xffL) << 8) | (b(17) & 0xffL)
        md5 = java.util.Arrays.copyOfRange(b, 18, 34)
        sawStreamInfo = true
      }
      p += len
    }
    if (!sawStreamInfo || sampleRate <= 0 || channels < 1 || channels > 8 ||
      bps < 4 || bps > 32) return None
    // refuse absurd declared sizes before allocating (same cap discipline
    // as Jpeg/Gif: crafted headers must not force huge allocations)
    if (totalSamples > (1L << 32)) return None
    val chans = Array.fill(channels)(new IntBuf())

    val r = new BitReader(bytes)
    r.pos = p
    var decoded = 0L
    while (r.pos < bytes.length - 1 &&
      (totalSamples == 0 || decoded < totalSamples)) {
      val frameStart = r.pos
      // frame header
      if ((r.read(14) & 0x3FFF) != 0x3FFE) return None // lost sync
      if (r.readBit() != 0) return None // reserved
      r.readBit() // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chanAsgn = r.read(4).toInt
      val ssCode = r.read(3).toInt
      if (r.readBit() != 0) return None // reserved
      readCodedNumber(r)
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c => BlockSizeCodes.getOrElse(c, return None)
      }
      srCode match { // value only needed when it overrides STREAMINFO
        case 0 => ()
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case 15 => return None
        case c => SampleRateCodes.getOrElse(c, return None)
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 3 => return None
        case c => SampleSizeCodes.getOrElse(c, return None)
      }
      r.alignByte()
      if (crc8(bytes, frameStart, r.pos) != (r.read(8).toInt & 0xff)) return None

      if (blockSize <= 0 || blockSize > 65536) return None
      val nCh = if (chanAsgn < 8) chanAsgn + 1
      else if (chanAsgn <= 10) 2
      else return None
      if (nCh != channels) return None

      val frame = Array.ofDim[Array[Long]](nCh)
      var c = 0
      while (c < nCh) {
        // side channels carry one extra bit
        val extra = chanAsgn match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        frame(c) = decodeSubframe(r, blockSize, frameBps + extra)
        c += 1
      }
      r.alignByte()
      val bodyEnd = r.pos
      val expected = crc16(bytes, frameStart, bodyEnd)
      if (r.read(16).toInt != expected) return None

      // undo stereo decorrelation
      val out: Array[Array[Long]] = chanAsgn match {
        case 8 => // left/side: right = left - side
          val l = frame(0); val s = frame(1)
          Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 9 => // side/right: left = right + side
          val s = frame(0); val rr = frame(1)
          Array(Array.tabulate(blockSize)(i => rr(i) + s(i)), rr)
        case 10 => // mid/side
          val m = frame(0); val s = frame(1)
          val l = new Array[Long](blockSize); val rt = new Array[Long](blockSize)
          var i = 0
          while (i < blockSize) {
            var mid = m(i) << 1
            mid |= (s(i) & 1L)
            l(i) = (mid + s(i)) >> 1
            rt(i) = (mid - s(i)) >> 1
            i += 1
          }
          Array(l, rt)
        case _ => frame
      }
      var ci = 0
      while (ci < channels) {
        val buf = chans(ci)
        val src = out(ci)
        var i = 0
        while (i < blockSize) { buf += src(i).toInt; i += 1 }
        ci += 1
      }
      decoded += blockSize
      // stop at the declared sample count (tolerates trailing garbage)
      if (totalSamples != 0 && decoded >= totalSamples) {
        val arrs = chans.map(_.result(totalSamples))
        return Some(Audio(sampleRate, channels, bps, arrs,
          verifyMd5(arrs, bps, md5)))
      }
    }
    val res = chans.map(_.result(decoded))
    Some(Audio(sampleRate, channels, bps, res, verifyMd5(res, bps, md5)))
  }

  /** MD5 of interleaved little-endian signed PCM — the layout STREAMINFO
    * signs. None when the hash is absent (all-zero) or bps not byte-aligned. */
  private def verifyMd5(chans: Array[Array[Int]], bps: Int,
      expect: Array[Byte]): Option[Boolean] = {
    if (expect.forall(_ == 0) || bps % 8 != 0) return None
    Some(java.util.Arrays.equals(pcmMd5(chans, bps), expect))
  }

  private[ops] def pcmMd5(chans: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nBytes = bps / 8
    val n = if (chans.isEmpty) 0 else chans(0).length
    val buf = new Array[Byte](chans.length * nBytes)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < chans.length) {
        val v = chans(c)(i)
        var b = 0
        while (b < nBytes) { buf(c * nBytes + b) = ((v >> (8 * b)) & 0xff).toByte; b += 1 }
        c += 1
      }
      md.update(buf)
      i += 1
    }
    md.digest()
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    if (r.readBit() != 0) throw new IllegalStateException("subframe pad")
    val stype = r.read(6).toInt
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    if (effBps <= 0) throw new IllegalStateException("wasted >= bps")
    val out: Array[Long] =
      if (stype == 0) { // CONSTANT
        val v = r.readSigned(effBps)
        Array.fill(blockSize)(v)
      } else if (stype == 1) { // VERBATIM
        Array.fill(blockSize)(r.readSigned(effBps))
      } else if ((stype & 0x38) == 8 && (stype & 0x7) <= 4) { // FIXED
        val order = stype & 0x7
        val s = new Array[Long](blockSize)
        var i = 0
        while (i < order) { s(i) = r.readSigned(effBps); i += 1 }
        val res = decodeResidual(r, blockSize, order)
        val coefs = FixedCoefs(order)
        while (i < blockSize) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) = res(i - order) + pred
          i += 1
        }
        s
      } else if ((stype & 0x20) != 0) { // LPC
        val order = (stype & 0x1F) + 1
        if (order > blockSize) throw new IllegalStateException("order > block")
        val s = new Array[Long](blockSize)
        var i = 0
        while (i < order) { s(i) = r.readSigned(effBps); i += 1 }
        val precision = r.read(4).toInt + 1
        if (precision == 16) throw new IllegalStateException("bad precision")
        val shift = r.readSigned(5).toInt
        if (shift < 0) throw new IllegalStateException("negative shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = decodeResidual(r, blockSize, order)
        while (i < blockSize) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) = res(i - order) + (pred >> shift)
          i += 1
        }
        s
      } else throw new IllegalStateException(s"reserved subframe $stype")
    if (wasted > 0) { var i = 0; while (i < blockSize) { out(i) <<= wasted; i += 1 } }
    out
  }

  private def decodeResidual(r: BitReader, blockSize: Int, predOrder: Int): Array[Long] = {
    val method = r.read(2).toInt
    if (method > 1) throw new IllegalStateException("residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.read(4).toInt
    val nParts = 1 << partOrder
    if (partOrder > 0 &&
      (blockSize % nParts != 0 || (blockSize >> partOrder) <= predOrder))
      throw new IllegalStateException("partition order")
    if (partOrder == 0 && blockSize < predOrder)
      throw new IllegalStateException("block < predictor order")
    val out = new Array[Long](blockSize - predOrder)
    var idx = 0
    var part = 0
    while (part < nParts) {
      val n = (blockSize >> partOrder) - (if (part == 0) predOrder else 0)
      val param = r.read(paramBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < n) { out(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary().toLong
          val v = (q << param) | r.read(param)
          out(idx) = (v >>> 1) ^ -(v & 1L) // zigzag unfold
          idx += 1; i += 1
        }
      }
      part += 1
    }
    out
  }

  // ---------------- encode ---------------------------------------------
  /** Encode PCM losslessly. `samples(c)(i)` = channel c, sample i, signed
    * at `bps` (8/16/24). Per-frame stereo-mode and per-subframe predictor
    * (constant / fixed 0–4 / LPC) selection by estimated cost. */
  def encode(samples: Array[Array[Int]], sampleRate: Int, bps: Int,
      blockSize: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty && samples.length <= 8, "1..8 channels")
    require(bps == 8 || bps == 16 || bps == 24, "bps 8/16/24")
    require(samples.forall(_.length == samples(0).length), "equal channel lengths")
    require(blockSize >= 16 && blockSize <= 32768, "block size 16..32768")
    val total = samples(0).length.toLong
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.write(blockSize, 16); si.write(blockSize, 16)
    si.write(0, 24); si.write(0, 24) // frame sizes unknown
    si.write(sampleRate, 20)
    si.write(samples.length - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    val siBytes = si.toBytes ++ pcmMd5(samples, bps)
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)

    var frameNo = 0L
    var off = 0L
    while (off < total) {
      val n = math.min(blockSize.toLong, total - off).toInt
      out.write(encodeFrame(samples, off.toInt, n, frameNo, sampleRate, bps,
        blockSize))
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  private def encodeFrame(samples: Array[Array[Int]], off: Int, n: Int,
      frameNo: Long, sampleRate: Int, bps: Int, nominalBlock: Int): Array[Byte] = {
    val channels = samples.length
    def slice(c: Int): Array[Long] =
      Array.tabulate(n)(i => samples(c)(off + i).toLong)

    // stereo-mode selection by order-2 residual magnitude (the standard
    // cheap estimator); non-stereo is always independent
    val (chanAsgn, chanData, chanBits): (Int, Array[Array[Long]], Array[Int]) =
      if (channels == 2) {
        val l = slice(0); val r = slice(1)
        val m = Array.tabulate(n)(i => (l(i) + r(i)) >> 1)
        val s = Array.tabulate(n)(i => l(i) - r(i))
        def cost(x: Array[Long]): Long = {
          var sum = 0L
          var i = 2
          while (i < x.length) { sum += math.abs(x(i) - 2 * x(i - 1) + x(i - 2)); i += 1 }
          sum
        }
        val cl = cost(l); val cr = cost(r); val cm = cost(m); val cs = cost(s)
        val modes = Seq(
          (cl + cr, 1, Array(l, r), Array(bps, bps)),
          (cl + cs, 8, Array(l, s), Array(bps, bps + 1)),
          (cs + cr, 9, Array(s, r), Array(bps + 1, bps)),
          (cm + cs, 10, Array(m, s), Array(bps, bps + 1)))
        val best = modes.minBy(_._1)
        (best._2, best._3, best._4)
      } else
        (channels - 1, Array.tabulate(channels)(slice),
          Array.fill(channels)(bps))

    val w = new BitWriter
    w.write(0x3FFE, 14); w.writeBit(0); w.writeBit(0) // sync, reserved, fixed-blocksize
    val bsCode = BlockSizeCodes.find(_._2 == n).map(_._1)
      .getOrElse(if (n <= 256) 6 else 7)
    w.write(bsCode, 4)
    w.write(0, 4) // sample rate: from STREAMINFO
    w.write(chanAsgn, 4)
    val ssCode = SampleSizeCodes.find(_._2 == bps).map(_._1).getOrElse(0)
    w.write(ssCode, 3)
    w.writeBit(0)
    writeCodedNumber(w, frameNo)
    if (bsCode == 6) w.write(n - 1, 8)
    else if (bsCode == 7) w.write(n - 1, 16)
    w.alignByte()
    val hdr = w.toBytes
    val withCrc8 = hdr :+ crc8(hdr, 0, hdr.length).toByte

    val body = new BitWriter
    var c = 0
    while (c < chanData.length) {
      encodeSubframe(body, chanData(c), chanBits(c))
      c += 1
    }
    val bodyBytes = body.toBytes
    val frame = withCrc8 ++ bodyBytes
    val c16 = crc16(frame, 0, frame.length)
    frame ++ Array(((c16 >> 8) & 0xff).toByte, (c16 & 0xff).toByte)
  }

  /** Order-k fixed-predictor residual, k in 0..4. */
  private def fixedResidual(x: Array[Long], order: Int): Array[Long] = {
    val coefs = FixedCoefs(order)
    Array.tabulate(x.length - order) { k =>
      val i = k + order
      var pred = 0L
      var j = 0
      while (j < order) { pred += coefs(j) * x(i - 1 - j); j += 1 }
      x(i) - pred
    }
  }

  /** Levinson–Durbin LPC analysis + coefficient quantization. Returns
    * (quantized coefs, shift) or None when the signal is degenerate. The
    * encoder computes residuals with the QUANTIZED coefficients, so decode
    * is exact regardless of quantization error. */
  private def lpcAnalyze(x: Array[Long], order: Int, precision: Int)
      : Option[(Array[Long], Int)] = {
    val n = x.length
    if (order < 1 || n <= order * 2) return None
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var sum = 0.0
      var i = lag
      while (i < n) { sum += x(i).toDouble * x(i - lag); i += 1 }
      ac(lag) = sum
      lag += 1
    }
    if (ac(0) == 0.0) return None
    val lpc = new Array[Double](order)
    var err = ac(0)
    var i = 0
    while (i < order) {
      var acc = ac(i + 1)
      var j = 0
      while (j < i) { acc -= lpc(j) * ac(i - j); j += 1 }
      val k = acc / err
      lpc(i) = k
      var jj = 0
      while (jj < i / 2) {
        val t = lpc(jj)
        lpc(jj) = t - k * lpc(i - 1 - jj)
        lpc(i - 1 - jj) -= k * t
        jj += 1
      }
      if (i % 2 == 1) lpc(i / 2) -= k * lpc(i / 2)
      err *= (1 - k * k)
      if (err <= 0 || err.isNaN) return None
      i += 1
    }
    val maxC = lpc.map(math.abs).max
    if (maxC == 0.0 || maxC.isNaN || maxC.isInfinity) return None
    var shift = precision - 1 - math.max(0,
      math.ceil(math.log(maxC) / math.log(2)).toInt + 1)
    if (shift > 15) shift = 15
    if (shift < 0) return None
    val lim = (1L << (precision - 1)) - 1
    val q = lpc.map { cf =>
      math.max(-lim - 1, math.min(lim, math.round(cf * (1L << shift))))
    }
    if (q.forall(_ == 0L)) return None
    Some((q, shift))
  }

  private def lpcResidual(x: Array[Long], coefs: Array[Long], shift: Int)
      : Array[Long] = {
    val order = coefs.length
    Array.tabulate(x.length - order) { k =>
      val i = k + order
      var pred = 0L
      var j = 0
      while (j < order) { pred += coefs(j) * x(i - 1 - j); j += 1 }
      x(i) - (pred >> shift)
    }
  }

  /** Best 4-bit Rice parameter and its cost in bits (escape considered). */
  private def riceCost(res: Array[Long]): (Int, Long) = {
    if (res.isEmpty) return (0, 0L)
    var best = (0, Long.MaxValue)
    var k = 0
    while (k < 15) {
      var bits = 0L
      var i = 0
      while (i < res.length && bits < best._2) {
        val v = res(i)
        val folded = (v << 1) ^ (v >> 63)
        bits += (folded >>> k) + 1 + k
        i += 1
      }
      if (bits < best._2) best = (k, bits)
      k += 1
    }
    // escape (raw) alternative — the 5-bit width field caps raw at 31 bits
    var maxBits = 1
    res.foreach { v =>
      val need = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
      if (need > maxBits) maxBits = need
    }
    val rawCost = 5L + res.length.toLong * maxBits
    if (maxBits <= 31 && rawCost < best._2) (-maxBits, rawCost) else best
  }

  private def writeResidual(w: BitWriter, res: Array[Long], rice: (Int, Long)): Unit = {
    w.write(0, 2) // method 0: 4-bit params
    w.write(0, 4) // partition order 0
    if (rice._1 < 0) { // escape: raw at fixed width
      val raw = -rice._1
      w.write(0xF, 4)
      w.write(raw, 5)
      res.foreach(v => w.write(v & ((1L << raw) - 1), raw))
    } else {
      w.write(rice._1, 4)
      res.foreach { v =>
        val folded = (v << 1) ^ (v >> 63)
        w.writeUnary((folded >>> rice._1).toInt)
        if (rice._1 > 0) w.write(folded & ((1L << rice._1) - 1), rice._1)
      }
    }
  }

  private def encodeSubframe(w: BitWriter, x: Array[Long], bps: Int): Unit = {
    w.writeBit(0)
    if (x.forall(_ == x(0))) { // CONSTANT
      w.write(0, 6); w.writeBit(0)
      w.write(x(0) & ((1L << bps) - 1), bps)
      return
    }
    // candidates: fixed orders 0..4 and one LPC order
    val maxFixed = math.min(4, x.length - 1)
    val fixedCands = (0 to maxFixed).map { o =>
      val res = fixedResidual(x, o)
      val rc = riceCost(res)
      (rc._2 + o.toLong * bps, ("fixed", o, res, rc, null: Array[Long], 0))
    }
    val lpcOrder = 8
    val precision = 12
    val lpcCand = lpcAnalyze(x, math.min(lpcOrder, x.length / 2 - 1), precision)
      .map { case (coefs, shift) =>
        val res = lpcResidual(x, coefs, shift)
        val rc = riceCost(res)
        (rc._2 + coefs.length.toLong * (bps + precision) + 9,
          ("lpc", coefs.length, res, rc, coefs, shift))
      }
    val (_, best) = (fixedCands ++ lpcCand).minBy(_._1)
    val (kind, order, res, rc, coefs, shift) = best
    if (kind == "fixed") {
      w.write(8 | order, 6); w.writeBit(0)
      var i = 0
      while (i < order) { w.write(x(i) & ((1L << bps) - 1), bps); i += 1 }
      writeResidual(w, res, rc)
    } else {
      w.write(0x20 | (order - 1), 6); w.writeBit(0)
      var i = 0
      while (i < order) { w.write(x(i) & ((1L << bps) - 1), bps); i += 1 }
      w.write(precision - 1, 4)
      w.write(shift.toLong & 0x1F, 5)
      coefs.foreach(cf => w.write(cf & ((1L << precision) - 1), precision))
      writeResidual(w, res, rc)
    }
  }

  /** Normalized mono samples in [-1, 1] (channels averaged) — the same
    * contract as [[Multimodal.wavSamples]], for the feature lane. */
  def flacSamples(bytes: Array[Byte]): Option[Array[Double]] =
    decode(bytes).map { a =>
      val n = a.samples(0).length
      val scale = (1L << (a.bps - 1)).toDouble
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < a.channels) { acc += a.samples(c)(i) / scale; c += 1 }
        out(i) = acc / a.channels
        i += 1
      }
      out
    }

  // small growable int buffer (avoids boxing in the per-sample hot loop);
  // the growth cap bounds what a crafted stream can make one task allocate
  private final class IntBuf {
    private var arr = new Array[Int](1 << 12)
    private var n = 0
    def +=(v: Int): Unit = {
      if (n == arr.length) {
        if (arr.length >= (1 << 28)) throw new IllegalStateException("too large")
        arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      }
      arr(n) = v; n += 1
    }
    def result(limit: Long): Array[Int] =
      java.util.Arrays.copyOf(arr, math.min(n.toLong, limit).toInt)
  }
}
