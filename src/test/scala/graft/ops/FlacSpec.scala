package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: lossless round-trips (the format's own STREAMINFO MD5 is
  * the cross-check), coverage of every subframe/stereo/residual decode
  * path — including ones the encoder never emits, via a hand-built
  * stream — and the no-throw fuzz posture. */
class FlacSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260813)

  private def sine(n: Int, amp: Double, period: Double, phase: Double = 0.0) =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * i / period + phase)).toInt)

  private def noise(n: Int, amp: Int) =
    Array.fill(n)(rnd.nextInt(2 * amp + 1) - amp)

  private def addArr(a: Array[Int], b: Array[Int]) =
    Array.tabulate(a.length)(i => a(i) + b(i))

  private def roundTrip(chans: Array[Array[Int]], sr: Int, bps: Int,
      block: Int = 4096): Flac.Audio = {
    val enc = Flac.encode(chans, sr, bps, block)
    val dec = Flac.decode(enc)
    assert(dec.nonEmpty, "decode failed")
    val a = dec.get
    assert(a.sampleRate == sr && a.channels == chans.length && a.bps == bps)
    assert(a.samples.length == chans.length)
    chans.indices.foreach { c =>
      assert(a.samples(c).sameElements(chans(c)),
        s"channel $c mismatch (bps=$bps block=$block)")
    }
    assert(a.md5Match.contains(true), s"embedded MD5 mismatch: ${a.md5Match}")
    a
  }

  /** Channel-assignment code of the FIRST frame (frame header byte 3). */
  private def firstFrameChanAsgn(flac: Array[Byte]): Int = {
    var p = 4
    var last = false
    while (!last) {
      last = (flac(p) & 0x80) != 0
      val len = ((flac(p + 1) & 0xff) << 16) | ((flac(p + 2) & 0xff) << 8) |
        (flac(p + 3) & 0xff)
      p += 4 + len
    }
    (flac(p + 3) & 0xff) >> 4
  }

  /** Subframe type of the first subframe of the first frame (it starts
    * byte-aligned right after the header CRC-8; first bit is the pad). */
  private def firstSubframeType(flac: Array[Byte]): Int = {
    var p = 4
    var last = false
    while (!last) {
      last = (flac(p) & 0x80) != 0
      val len = ((flac(p + 1) & 0xff) << 16) | ((flac(p + 2) & 0xff) << 8) |
        (flac(p + 3) & 0xff)
      p += 4 + len
    }
    val bsCode = (flac(p + 2) & 0xff) >> 4
    var q = p + 4 + 1 // fixed header + 1-byte coded number (frame 0)
    if (bsCode == 6) q += 1
    if (bsCode == 7) q += 2
    q += 1 // crc8
    ((flac(q) & 0xff) >> 1) & 0x3F
  }

  test("round-trip: mono 16-bit tone+noise, partial last block, MD5 signs") {
    val x = addArr(sine(10000, 12000, 97.3), noise(10000, 300))
    roundTrip(Array(x), 44100, 16)
  }

  test("round-trip: correlated stereo picks a side mode and stays exact") {
    val l = addArr(sine(8192, 9000, 53.1), noise(8192, 200))
    val r = addArr(l, noise(8192, 60)) // r ≈ l → side channel is cheap
    val enc = Flac.encode(Array(l, r), 48000, 16)
    assert(firstFrameChanAsgn(enc) >= 8, "expected a decorrelated stereo mode")
    roundTrip(Array(l, r), 48000, 16)
  }

  test("round-trip: independent stereo stays independent and exact") {
    val l = noise(4096, 20000)
    val r = noise(4096, 20000)
    val enc = Flac.encode(Array(l, r), 44100, 16)
    assert(firstFrameChanAsgn(enc) == 1, "uncorrelated noise → independent")
    roundTrip(Array(l, r), 44100, 16)
  }

  test("round-trip: 8-bit and 24-bit depths, odd block size") {
    roundTrip(Array(noise(5000, 100), noise(5000, 100)), 8000, 8, block = 768)
    val big = addArr(sine(5000, 4000000, 211.7), noise(5000, 5000))
    roundTrip(Array(big), 96000, 24, block = 1000)
  }

  test("round-trip: silence and constant blocks use CONSTANT subframes") {
    val enc = Flac.encode(Array(Array.fill(4096)(-7)), 16000, 16)
    assert(firstSubframeType(enc) == 0, "constant input → CONSTANT subframe")
    roundTrip(Array(Array.fill(9000)(-7)), 16000, 16)
    roundTrip(Array(new Array[Int](4096)), 16000, 16)
  }

  test("LPC beats fixed on an AR(2) signal and decodes exactly") {
    // x[i] = 1.8x[i-1] - 0.9x[i-2] + e: non-integer AR coefficients defeat
    // the integer fixed predictors, so cost selection must go LPC
    val n = 8192
    val x = new Array[Int](n)
    x(0) = 100; x(1) = 120
    var i = 2
    while (i < n) {
      val v = 1.8 * x(i - 1) - 0.9 * x(i - 2) + (rnd.nextInt(41) - 20)
      x(i) = math.max(-30000, math.min(30000, math.round(v).toInt))
      i += 1
    }
    val enc = Flac.encode(Array(x), 44100, 16)
    assert((firstSubframeType(enc) & 0x20) != 0, "expected an LPC subframe")
    roundTrip(Array(x), 44100, 16)
  }

  test("compression is real on tonal content") {
    val x = sine(32768, 15000, 441.0)
    val enc = Flac.encode(Array(x), 44100, 16)
    assert(enc.length < 32768 * 2 / 2,
      s"tonal content should compress >2x, got ${enc.length} of ${32768 * 2}")
  }

  test("decoder-only paths: wasted bits, rice partitions, 5-bit method") {
    // hand-built stream the encoder never produces: blockSize 16, one
    // mono frame, FIXED order 1, partition order 1, residual method 1
    // (5-bit params), 2 wasted bits — all samples are multiples of 4
    val samples = Array(4, 8, 12, 8, 4, 0, -4, -8, -12, -8, -4, 0, 4, 8, 12, 16)
    class W {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0; var n = 0
      def bit(b: Int): Unit = {
        acc = (acc << 1) | (b & 1); n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
      }
      def w(v: Long, bits: Int): Unit =
        (bits - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
      def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
      def bytes: Array[Byte] = { while (n != 0) bit(0); out.toByteArray }
    }
    val si = new W
    si.w(16, 16); si.w(16, 16); si.w(0, 24); si.w(0, 24)
    si.w(8000, 20); si.w(0, 3); si.w(15, 5) // 1 channel, 16 bps
    si.w(16, 36)
    val md5 = Flac.pcmMd5(Array(samples), 16)
    val siBytes = si.bytes ++ md5
    val hdr = new W
    hdr.w(0x3FFE, 14); hdr.bit(0); hdr.bit(0)
    hdr.w(6, 4)  // 8-bit explicit block size
    hdr.w(4, 4)  // 8000 Hz from the code table
    hdr.w(0, 4)  // 1 channel
    hdr.w(4, 3)  // 16 bps
    hdr.bit(0)
    hdr.w(0, 8)  // frame 0
    hdr.w(15, 8) // block size - 1
    val hdrBytes = hdr.bytes
    val crc8 = Flac.crc8(hdrBytes, 0, hdrBytes.length)
    val body = new W
    // subframe: pad, FIXED order 1, wasted-bits flag + unary(1) → wasted=2
    body.bit(0); body.w(8 | 1, 6); body.bit(1); body.unary(1)
    val shifted = samples.map(_ >> 2) // wasted=2
    body.w(shifted(0).toLong & 0x3FFF, 14) // warmup at 16-2 bits
    // residual: method 1, partition order 1 → two partitions of 8 (first
    // minus the predictor order), 5-bit params
    body.w(1, 2); body.w(1, 4)
    val res = (1 until 16).map(i => shifted(i) - shifted(i - 1))
    def rice(w: W, vs: Seq[Int], k: Int): Unit = vs.foreach { v =>
      val folded = (v << 1) ^ (v >> 31)
      w.unary(folded >>> k); if (k > 0) w.w(folded & ((1 << k) - 1), k)
    }
    body.w(2, 5); rice(body, res.take(7), 2)   // partition 1: 8-1 samples
    body.w(3, 5); rice(body, res.drop(7), 3)   // partition 2: 8 samples
    val bodyBytes = body.bytes
    val frame = (hdrBytes :+ crc8.toByte) ++ bodyBytes
    val crc16 = Flac.crc16(frame, 0, frame.length)
    val stream = "fLaC".getBytes("US-ASCII") ++
      Array(0x80.toByte, 0.toByte, 0.toByte, siBytes.length.toByte) ++
      siBytes ++ frame ++
      Array(((crc16 >> 8) & 0xff).toByte, (crc16 & 0xff).toByte)
    val dec = Flac.decode(stream)
    assert(dec.nonEmpty, "hand-built stream must decode")
    assert(dec.get.sampleRate == 8000 && dec.get.bps == 16)
    assert(dec.get.samples(0).sameElements(samples))
    assert(dec.get.md5Match.contains(true))
  }

  test("corruption is rejected, never thrown: bit flips, truncation, garbage") {
    val x = addArr(sine(6000, 10000, 77.0), noise(6000, 500))
    val enc = Flac.encode(Array(x, x.map(-_)), 44100, 16)
    val base = Flac.decode(enc).get
    assert(base.md5Match.contains(true))
    // flip bits at random positions: decode must never throw, and any
    // successful decode must be flagged by a CRC or MD5 mismatch
    (0 until 60).foreach { _ =>
      val pos = rnd.nextInt(enc.length)
      val mut = enc.clone()
      mut(pos) = (mut(pos) ^ (1 << rnd.nextInt(8))).toByte
      Flac.decode(mut).foreach { a =>
        val differs = a.channels != base.channels ||
          a.samples.zip(base.samples).exists { case (c, b) => !c.sameElements(b) }
        if (differs)
          assert(!a.md5Match.contains(true), s"silent corruption at byte $pos")
      }
    }
    (0 until 40).foreach { _ =>
      Flac.decode(java.util.Arrays.copyOf(enc, rnd.nextInt(enc.length)))
    }
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      Flac.decode(junk) // must not throw
      val framed = "fLaC".getBytes("US-ASCII") ++ junk
      Flac.decode(framed)
    }
  }

  test("flacSamples: normalized mono average in [-1,1] feeds the feature lane") {
    val l = sine(4096, 16000, 100.0)
    val r = sine(4096, 16000, 100.0, math.Pi) // opposite phase → cancels
    val enc = Flac.encode(Array(l, r), 44100, 16)
    val mono = Flac.flacSamples(enc).get
    assert(mono.length == 4096)
    assert(mono.forall(v => v >= -1.0 && v <= 1.0))
    assert(mono.map(math.abs).max < 0.01, "anti-phase stereo must cancel")
    val (n, rms, zcr) = Multimodal.wavFeatures(Flac.flacSamples(
      Flac.encode(Array(sine(8000, 12000, 50.0)), 16000, 16)).get)
    assert(n == 8000)
    assert(rms > 0.2 && rms < 0.4) // sine RMS = amp/√2 ≈ 0.259
    assert(zcr > 0.03 && zcr < 0.05) // 2 crossings per 50-sample period
    assert(Flac.flacSamples("not flac".getBytes("UTF-8")).isEmpty)
  }
}
