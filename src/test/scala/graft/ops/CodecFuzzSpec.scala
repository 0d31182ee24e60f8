package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz hardening: every byte-stream decoder must return None/empty on
  * arbitrary garbage and on bit-flipped/truncated valid streams — never
  * throw, never hang. (At 100 TB the corpus WILL contain corrupt media;
  * a decoder exception inside a mapPartitions task fails the whole job.) */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xC0DEC)

  private def decodeAll(bytes: Array[Byte]): Unit = {
    Png.decode(bytes)
    Gif.decode(bytes)
    Gif.decodeFrames(bytes)
    Gif.countFrames(bytes)
    Jpeg.decode(bytes)
    Multimodal.imageHeaderMeta(bytes)
    Multimodal.avHeaderMeta(bytes)
    Multimodal.wavSamples(bytes)
    Multimodal.decodeMeta(bytes)
    graft.sink.TarShards.tarEntries(bytes)
    Avi.headerMeta(bytes)
    Avi.decodeFrames(bytes)
    Avi.countFrames(bytes)
    Avi.fps(bytes)
    Multimodal.resizeMedia(bytes, 2)
    Multimodal.sampleFrames(bytes, 3)
    Adpcm.decodeIma(bytes, blockAlign = 8)
    Adpcm.decodeIma(bytes, blockAlign = 256)
    Adpcm.muLawDecodeAll(bytes)
    Flac.decode(bytes)
    Flac.flacSamples(bytes)
    Multimodal.audioSamples(bytes)
  }

  test("random garbage never throws in any decoder") {
    for (_ <- 1 to 150) {
      val len = rnd.nextInt(4096)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      decodeAll(b)
    }
  }

  test("garbage behind real magic numbers never throws") {
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte),
      "RIFF1234WAVE".getBytes("US-ASCII"),
      "1234ftypisom".getBytes("US-ASCII"),
      "fLaC".getBytes("US-ASCII"))
    for (m <- magics; _ <- 1 to 50) {
      val tail = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(tail)
      decodeAll(m ++ tail)
    }
  }

  test("bit-flipped and truncated valid streams never throw") {
    val px = Array.tabulate(16 * 12 * 3)(i => (i * 31 % 256).toByte)
    val img = Png.Image(16, 12, 3, px)
    val valid = Seq(
      Png.encode(img),
      Gif.encode(Png.Image(8, 8, 3,
        Array.tabulate(8 * 8 * 3)(i => (((i / 3) % 4) * 60).toByte))),
      Jpeg.encode(img, quality = 90),
      graft.sink.TarShards.tarBytes(Seq("a.txt" -> "hello".getBytes)))
    for (v <- valid) {
      for (_ <- 1 to 100) { // single random bit flip
        val b = v.clone()
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        decodeAll(b)
      }
      for (_ <- 1 to 50) decodeAll(v.take(rnd.nextInt(v.length))) // truncation
      for (_ <- 1 to 50) { // random splice of two regions
        val b = v.clone()
        val from = rnd.nextInt(b.length); val to = rnd.nextInt(b.length)
        val n = rnd.nextInt(math.min(64, b.length - math.max(from, to)) + 1)
        System.arraycopy(v, from, b, to, n)
        decodeAll(b)
      }
    }
  }

  test("crafted huge declared dimensions are rejected before allocation") {
    // a tiny file declaring 26000x26000 must not force a ~2 GB plane /
    // canvas allocation per task — one adversarial row would OOM
    // executors deterministically across retries
    val px = Array.tabulate(16 * 12 * 3)(i => (i * 31 % 256).toByte)
    val jpg = Jpeg.encode(Png.Image(16, 12, 3, px), quality = 90)
    // patch SOF0 height/width (big-endian at marker offset +5 / +7)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 4 < jpg.length) {
      if ((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0) sof = i
      else if ((jpg(i) & 0xff) == 0xff) {
        val len = ((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff)
        i += 2 + len
      } else i += 1
    }
    assert(sof > 0, "SOF0 not found in own encoder output")
    val huge = jpg.clone()
    huge(sof + 5) = 0x65; huge(sof + 6) = 0x90.toByte // height 26000
    huge(sof + 7) = 0x65; huge(sof + 8) = 0x90.toByte // width  26000
    val t0 = System.nanoTime()
    assert(Jpeg.decode(huge).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "rejection must be fast")

    val gif = Gif.encode(Png.Image(8, 8, 3,
      Array.tabulate(8 * 8 * 3)(i => (((i / 3) % 4) * 60).toByte)))
    val hugeGif = gif.clone()
    // logical screen size, little-endian at bytes 6..9 → 65535x65535
    hugeGif(6) = 0xff.toByte; hugeGif(7) = 0xff.toByte
    hugeGif(8) = 0xff.toByte; hugeGif(9) = 0xff.toByte
    assert(Gif.decode(hugeGif).isEmpty)
    assert(Gif.decodeFrames(hugeGif).isEmpty)
  }
}
