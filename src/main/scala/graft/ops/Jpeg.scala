package graft.ops

/** REAL baseline JPEG codec in pure JVM — no native image library needed.
  *
  * Decode supports baseline/extended sequential DCT (SOF0/SOF1) with
  * 8-bit precision, grayscale and YCbCr (any 4:4:4 / 4:2:2 / 4:2:0 / 4:1:1
  * sampling), multiple DQT/DHT tables, and restart intervals — i.e. what
  * every mainstream encoder (libjpeg, ImageIO, PIL) emits by default.
  * Progressive (SOF2), arithmetic coding, 12-bit, and CMYK return None and
  * fall back to header-only metadata in [[Multimodal]].
  *
  * Encode emits baseline 4:4:4 (or single-component grayscale) with the
  * Annex K example quantization tables (quality-scaled per libjpeg's
  * formula) and the Annex K typical Huffman tables — a stream any decoder
  * reads back (the spec's JpegSpec asserts ImageIO can).
  *
  * This completes the image lane: PNG, GIF, and JPEG all decode to actual
  * pixels (reference counterpart: the validator's media handling,
  * `modules/validator.py`, which gets JPEG support from PIL).
  */
object Jpeg {

  // ---------- shared tables ----------

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** natural index → zigzag position */
  private val InvZigzag: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(Zigzag(i)) = i; i += 1 }
    inv
  }

  /** 1-D DCT-III basis: Basis(x)(u) = c(u)·cos((2x+1)uπ/16), c(0)=1/√2. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---------- decode ----------

  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    // spec F.2.2.3 canonical-code decode tables, 1-indexed by code length
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        if (counts(l - 1) > 0) maxCode(l) = code - 1
        code <<= 1
        k += counts(l - 1)
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = symbols(valPtr(len) + code - minCode(len))
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0 // huffman table selectors, set by SOS
  }

  /** Entropy-segment bit reader with FF00 byte-unstuffing; restart markers
    * are consumed explicitly via [[restart]]. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bits = 0
    private var nBits = 0
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length) throw new JpegTruncated
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) throw new JpegTruncated
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else if (m >= 0xd0 && m <= 0xd7) {
            // unexpected RSTn mid-block: treat as corrupt
            throw new JpegTruncated
          } else {
            // real marker (EOI / next scan) — signal end of data
            throw new JpegTruncated
          }
          b = 0xff
        }
        bits = b; nBits = 8
      }
      nBits -= 1
      (bits >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      nBits = 0
      if (pos + 2 > bytes.length) throw new JpegTruncated
      if ((bytes(pos) & 0xff) != 0xff ||
        (bytes(pos + 1) & 0xff) != (0xd0 | n)) throw new JpegTruncated
      pos += 2
    }
  }
  private final class JpegTruncated extends RuntimeException

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (code > t.maxCode(l)) {
      if (l >= 16) throw new JpegTruncated
      code = (code << 1) | br.nextBit()
      l += 1
    }
    t.value(l, code)
  }

  /** spec F.2.2.1 EXTEND: map magnitude-category bits to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a JPEG byte stream to 8-bit pixels; None for unsupported
    * shapes (progressive, 12-bit, CMYK) or malformed data. */
  def decode(bytes: Array[Byte]): Option[Png.Image] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    try decodeUnsafe(bytes)
    catch { case _: JpegTruncated | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException | _: NumberFormatException => None }
  }

  private def decodeUnsafe(bytes: Array[Byte]): Option[Png.Image] = {
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var i = 2
    var scanStart = -1
    while (scanStart < 0 && i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd9) return None // EOI before any scan
      else if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) i += 2
      else {
        val len = u16(i + 2)
        val at = i + 4
        if (at + len - 2 > bytes.length) return None
        marker match {
          case 0xdb => // DQT: one or more (pq/tq, table) entries
            var p = at
            while (p < at + len - 2) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              // DQT payload is in zigzag order — store natural-order
              val tbl = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tbl(Zigzag(k)) = if (pq == 0) bytes(p + 1 + k) & 0xff
                                 else u16(p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = tbl
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: one or more (tc/th, counts, symbols)
            var p = at
            while (p < at + len - 2) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              val counts = Array.tabulate(16)(j => bytes(p + 1 + j) & 0xff)
              val n = counts.sum
              val symbols = Array.tabulate(n)(j => bytes(p + 17 + j) & 0xff)
              val t = new HuffTable(counts, symbols)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0/1: baseline / extended sequential
            if ((bytes(at) & 0xff) != 8) return None // 8-bit only
            height = u16(at + 1); width = u16(at + 3)
            val n = bytes(at + 5) & 0xff
            if (n != 1 && n != 3) return None // gray or YCbCr only
            comps = Array.tabulate(n) { c =>
              val b = at + 6 + 3 * c
              Component(bytes(b) & 0xff, (bytes(b + 1) & 0xff) >> 4,
                bytes(b + 1) & 0x0f, bytes(b + 2) & 0xff)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
              return None
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / lossless / arithmetic
          case 0xdd => restartInterval = u16(at)
          case 0xda => // SOS
            if (comps == null) return None
            val n = bytes(at) & 0xff
            if (n != comps.length) return None // interleaved single scan only
            var c = 0
            while (c < n) {
              val id = bytes(at + 1 + 2 * c) & 0xff
              val sel = bytes(at + 2 + 2 * c) & 0xff
              comps.find(_.id == id) match {
                case Some(comp) => comp.td = sel >> 4; comp.ta = sel & 0x0f
                case None => return None
              }
              c += 1
            }
            scanStart = at + 1 + 2 * n + 3 // skip Ss/Se/Ah-Al
          case _ => // APPn / COM / others: skip
        }
        if (scanStart < 0) i = at + len - 2
      }
    }
    if (scanStart < 0 || width <= 0 || height <= 0) return None
    // SOF dimensions are untrusted input: a tiny crafted file can declare
    // 26000×26000 and force a ~2 GB plane allocation per task before any
    // scan data is read. Cap at 64M pixels (192 MB RGB) — far above any
    // legitimate corpus image, far below an executor-OOM.
    if (width.toLong * height.toLong > 64L * 1024 * 1024) return None

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    // JPEG spec caps sampling factors at 4; larger values are corrupt and
    // would multiply the plane allocation past the pixel cap above.
    if (hMax > 4 || vMax > 4 || comps.exists(c => c.h < 1 || c.v < 1))
      return None
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH

    // per-component sample planes, padded to whole MCUs at component scale
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(c =>
      new Array[Byte](planeW(c) * planeH(c))).toArray

    val br = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coeff = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstN = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstN)
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val q = quant(comp.tq)
        if (q == null) return None
        val dcT = dcTables(comp.td)
        val acT = acTables(comp.ta)
        if (dcT == null || acT == null) return None
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // --- decode one 8×8 block (spec F.2.2) ---
            java.util.Arrays.fill(coeff, 0)
            val t = decodeHuff(br, dcT)
            dcPred(c) += extend(br.receive(t), t)
            coeff(0) = dcPred(c) * q(0)
            var k = 1
            while (k < 64) {
              val rs = decodeHuff(br, acT)
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) throw new JpegTruncated
                coeff(Zigzag(k)) = extend(br.receive(s), s) * q(Zigzag(k))
                k += 1
              }
            }
            // --- separable IDCT: rows then columns ---
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += Basis(x)(u) * coeff(y * 8 + u); u += 1 }
                tmp(y * 8 + x) = acc
                x += 1
              }
              y += 1
            }
            val plane = planes(c)
            val pw = planeW(c)
            val px0 = (mx * comp.h + bx) * 8
            val py0 = (my * comp.v + by) * 8
            var x = 0
            while (x < 8) {
              var yy = 0
              while (yy < 8) {
                var acc = 0.0
                var v = 0
                while (v < 8) { acc += Basis(yy)(v) * tmp(v * 8 + x); v += 1 }
                val s = (acc / 4.0 + 128.5).toInt
                plane((py0 + yy) * pw + px0 + x) =
                  (if (s < 0) 0 else if (s > 255) 255 else s).toByte
                yy += 1
              }
              x += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    // assemble: upsample chroma by sampling-factor ratio (nearest)
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      Some(Png.Image(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def samp(c: Int): Int = {
            val sx = x * comps(c).h / hMax
            val sy = y * comps(c).v / vMax
            planes(c)(sy * planeW(c) + sx) & 0xff
          }
          val yy = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          val r = (yy + 1.402 * cr + 0.5).toInt
          val g = (yy - 0.344136 * cb - 0.714136 * cr + 0.5).toInt
          val b = (yy + 1.772 * cb + 0.5).toInt
          val o = (y * width + x) * 3
          out(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(o + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
      Some(Png.Image(width, height, 3, out))
    }
  }

  // ---------- encode ----------

  /** Annex K example quantization tables (the de-facto standard ones every
    * JPEG encoder quality-scales), natural (row-major) order. */
  private val LumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val ChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg's quality → table scaling. */
  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  /** Optimal length-limited Huffman from symbol frequencies — the JPEG
    * Annex K.2 procedure (merge chains → code sizes → limit to 16 bits,
    * with a reserved dummy so no real symbol gets the all-ones code).
    * Returns (bits[16], symbols in canonical order). */
  private def buildHuffman(freqIn: Array[Long]): (Array[Int], Array[Int]) = {
    val n = 257
    val freq = java.util.Arrays.copyOf(freqIn, n)
    freq(256) = 1 // dummy claims the all-ones code
    val codesize = new Array[Int](n)
    val others = Array.fill(n)(-1)
    var done = false
    while (!done) {
      var v1 = -1; var v2 = -1
      var j = 0
      while (j < n) {
        if (freq(j) > 0 && (v1 < 0 || freq(j) < freq(v1) ||
          (freq(j) == freq(v1) && j > v1))) v1 = j
        j += 1
      }
      j = 0
      while (j < n) {
        if (j != v1 && freq(j) > 0 && (v2 < 0 || freq(j) < freq(v2) ||
          (freq(j) == freq(v2) && j > v2))) v2 = j
        j += 1
      }
      if (v2 < 0) done = true
      else {
        freq(v1) += freq(v2); freq(v2) = 0
        codesize(v1) += 1
        var t = v1
        while (others(t) != -1) { t = others(t); codesize(t) += 1 }
        others(t) = v2
        codesize(v2) += 1
        t = v2
        while (others(t) != -1) { t = others(t); codesize(t) += 1 }
      }
    }
    val bits = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (codesize(i) > 0) bits(math.min(codesize(i), 63)) += 1
      i += 1
    }
    // limit code lengths to 16 (Annex K, Figure K.3)
    i = 63
    while (i > 16) {
      while (bits(i) > 0) {
        var j2 = i - 2
        while (bits(j2) == 0) j2 -= 1
        bits(i) -= 2; bits(i - 1) += 1; bits(j2 + 1) += 2; bits(j2) -= 1
      }
      i -= 1
    }
    // drop the dummy symbol's slot from the longest used length
    i = 16
    while (i > 0 && bits(i) == 0) i -= 1
    if (i > 0) bits(i) -= 1
    // canonical symbol order: by code size, then by symbol value
    val symbols = (0 until 256).filter(codesize(_) > 0)
      .sortBy(s => (codesize(s), s)).toArray
    (java.util.Arrays.copyOfRange(bits, 1, 17), symbols)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nAcc = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (spec F.1.2.3). */
    def flush(): Unit = {
      while (nAcc != 0) put(1, 1)
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Forward 8×8 DCT + quantize + zigzag; `block` is centered samples. */
  private def fdctQuant(block: Array[Double], q: Array[Int],
                        out: Array[Int]): Unit = {
    val t = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += Basis(x)(u) * block(y * 8 + x); x += 1 }
        t(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 8) { acc += Basis(yy)(v) * t(yy * 8 + u); yy += 1 }
        val coef = acc / 4.0
        val k = v * 8 + u
        out(InvZigzag(k)) = math.round(coef / q(k)).toInt
        u += 1
      }
      v += 1
    }
  }

  /** Encode to baseline JPEG: grayscale for 1-channel input, YCbCr
    * otherwise (alpha dropped) at the requested chroma `sampling` —
    * (1,1) = 4:4:4, (2,1) = 4:2:2, (2,2) = 4:2:0 (the shape mainstream
    * encoders ship; chroma is box-filtered). `restartInterval` > 0 emits
    * DRI + RSTn every that many MCUs (what a parallel encoder would emit
    * per stripe). */
  def encode(img: Png.Image, quality: Int = 90,
             restartInterval: Int = 0,
             sampling: (Int, Int) = (1, 1)): Array[Byte] = {
    val gray = img.channels == 1
    val nComp = if (gray) 1 else 3
    val (hY, vY) = if (gray) (1, 1) else sampling
    require(hY >= 1 && hY <= 2 && vY >= 1 && vY <= 2, s"sampling $sampling")
    val lumaQ = scaleQuant(LumaQuant, quality)
    val chromaQ = scaleQuant(ChromaQuant, quality)
    val mcuW = 8 * hY; val mcuH = 8 * vY
    val mcusX = (img.width + mcuW - 1) / mcuW
    val mcusY = (img.height + mcuH - 1) / mcuH

    // pass 0: color-convert into per-component planes, edge-replicated to
    // whole MCUs; chroma box-filtered down by (hY, vY)
    val lw = mcusX * mcuW; val lh = mcusY * mcuH
    val cw = mcusX * 8; val ch = mcusY * 8
    val planeW = Array(lw, cw, cw)
    val luma = new Array[Double](lw * lh)
    val cb = if (gray) null else new Array[Double](cw * ch)
    val cr = if (gray) null else new Array[Double](cw * ch)
    var y = 0
    while (y < lh) {
      val sy = math.min(y, img.height - 1)
      var x = 0
      while (x < lw) {
        val sx = math.min(x, img.width - 1)
        if (gray) luma(y * lw + x) = img.sample(sx, sy, 0) - 128.0
        else {
          val r = img.sample(sx, sy, 0).toDouble
          val g = img.sample(sx, sy, 1).toDouble
          val b = img.sample(sx, sy, 2).toDouble
          luma(y * lw + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        }
        x += 1
      }
      y += 1
    }
    if (!gray) {
      var cy = 0
      while (cy < ch) {
        var cx = 0
        while (cx < cw) {
          var sb = 0.0; var sr = 0.0
          var dy = 0
          while (dy < vY) {
            var dx = 0
            while (dx < hY) {
              val sy = math.min(cy * vY + dy, img.height - 1)
              val sx = math.min(cx * hY + dx, img.width - 1)
              val r = img.sample(sx, sy, 0).toDouble
              val g = img.sample(sx, sy, 1).toDouble
              val b = img.sample(sx, sy, 2).toDouble
              sb += -0.168736 * r - 0.331264 * g + 0.5 * b
              sr += 0.5 * r - 0.418688 * g - 0.081312 * b
              dx += 1
            }
            dy += 1
          }
          cb(cy * cw + cx) = sb / (hY * vY)
          cr(cy * cw + cx) = sr / (hY * vY)
          cx += 1
        }
        cy += 1
      }
    }
    val planes: Array[Array[Double]] =
      if (gray) Array(luma) else Array(luma, cb, cr)

    // pass 1: DCT+quantize every block in SCAN ORDER (per MCU: hY×vY luma
    // blocks then one block per chroma component); collect Huffman stats
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
    val dcFreq = Array.fill(if (gray) 1 else 2)(new Array[Long](256))
    val acFreq = Array.fill(if (gray) 1 else 2)(new Array[Long](256))
    val block = new Array[Double](64)
    val dcPred = new Array[Int](nComp)
    val totalMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
        java.util.Arrays.fill(dcPred, 0)
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < nComp) {
        val cls = if (c == 0) 0 else 1
        val (ch2, cv2) = if (c == 0) (hY, vY) else (1, 1)
        val pw = planeW(c)
        var by = 0
        while (by < cv2) {
          var bx = 0
          while (bx < ch2) {
            val px0 = (mx * ch2 + bx) * 8
            val py0 = (my * cv2 + by) * 8
            var j = 0
            while (j < 64) {
              block(j) = planes(c)((py0 + j / 8) * pw + px0 + j % 8)
              j += 1
            }
            val zz = new Array[Int](64)
            fdctQuant(block, if (c == 0) lumaQ else chromaQ, zz)
            emitted += ((c, zz))
            val diff = zz(0) - dcPred(c); dcPred(c) = zz(0)
            dcFreq(cls)(category(diff)) += 1
            var k = 1; var run = 0
            while (k < 64) {
              if (zz(k) == 0) run += 1
              else {
                while (run > 15) { acFreq(cls)(0xf0) += 1; run -= 16 }
                acFreq(cls)((run << 4) | category(zz(k))) += 1
                run = 0
              }
              k += 1
            }
            if (run > 0) acFreq(cls)(0x00) += 1 // EOB
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    val dcTables = dcFreq.map(buildHuffman)
    val acTables = acFreq.map(buildHuffman)
    def codeMap(t: (Array[Int], Array[Int])): (Array[Int], Array[Int]) = {
      val (bits, symbols) = t
      val codes = new Array[Int](256); val lens = new Array[Int](256)
      var code = 0; var si = 0; var l = 1
      while (l <= 16) {
        var i2 = 0
        while (i2 < bits(l - 1)) {
          codes(symbols(si)) = code; lens(symbols(si)) = l
          code += 1; si += 1; i2 += 1
        }
        code <<= 1; l += 1
      }
      (codes, lens)
    }
    val dcCodes = dcTables.map(codeMap)
    val acCodes = acTables.map(codeMap)

    // pass 2: emit the stream
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    marker(0xe0); w16(16) // APP0 JFIF 1.1, no density, no thumb
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    def writeDqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xdb); w16(67); w8(id)
      var k = 0
      while (k < 64) { w8(tbl(Zigzag(k))); k += 1 } // zigzag order payload
    }
    writeDqt(0, lumaQ)
    if (!gray) writeDqt(1, chromaQ)
    marker(0xc0); w16(8 + 3 * nComp); w8(8) // SOF0
    w16(img.height); w16(img.width); w8(nComp)
    var c = 0
    while (c < nComp) {
      w8(c + 1)
      w8(if (c == 0) (hY << 4) | vY else 0x11) // sampling factors
      w8(if (c == 0) 0 else 1)
      c += 1
    }
    def writeDht(tc: Int, th: Int, t: (Array[Int], Array[Int])): Unit = {
      val (bits, symbols) = t
      marker(0xc4); w16(19 + symbols.length); w8((tc << 4) | th)
      bits.foreach(w8); symbols.foreach(w8)
    }
    writeDht(0, 0, dcTables(0)); writeDht(1, 0, acTables(0))
    if (!gray) { writeDht(0, 1, dcTables(1)); writeDht(1, 1, acTables(1)) }
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    marker(0xda); w16(6 + 2 * nComp); w8(nComp) // SOS
    c = 0
    while (c < nComp) {
      w8(c + 1); w8(if (c == 0) 0x00 else 0x11)
      c += 1
    }
    w8(0); w8(63); w8(0)

    val bw = new BitWriter(out)
    java.util.Arrays.fill(dcPred, 0)
    val blocksPerMcu = hY * vY + (nComp - 1)
    var rstN = 0
    var bi = 0
    while (bi < emitted.length) {
      val mcuIdx = bi / blocksPerMcu
      if (bi % blocksPerMcu == 0 && restartInterval > 0 && mcuIdx > 0 &&
        mcuIdx % restartInterval == 0) {
        bw.flush()
        marker(0xd0 | rstN); rstN = (rstN + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val (comp, zz) = emitted(bi)
      val cls = if (comp == 0) 0 else 1
      val diff = zz(0) - dcPred(comp); dcPred(comp) = zz(0)
      val t = category(diff)
      bw.put(dcCodes(cls)._1(t), dcCodes(cls)._2(t))
      if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      var k = 1; var run = 0
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) {
            bw.put(acCodes(cls)._1(0xf0), acCodes(cls)._2(0xf0)); run -= 16
          }
          val s = category(zz(k))
          val rs = (run << 4) | s
          bw.put(acCodes(cls)._1(rs), acCodes(cls)._2(rs))
          bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCodes(cls)._1(0x00), acCodes(cls)._2(0x00))
      bi += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
