package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-AVI codec: container structure, frame round-trip fidelity
  * (through the real JPEG codec), header metadata, sampling, resize. */
class AviSpec extends AnyFunSuite {

  // distinct flat-gray frames: JPEG reproduces flat fields near-exactly,
  // so frame IDENTITY (which frame is which) is testable despite loss
  private def frame(level: Int, w: Int = 32, h: Int = 24): Png.Image =
    Png.Image(w, h, 3, Array.fill(w * h * 3)(level.toByte))

  private val levels = Seq(30, 80, 130, 180, 230)
  private lazy val avi = Avi.encode(levels.map(frame(_)), fps = 5)

  test("container structure: RIFF/AVI with hdrl, movi, idx1") {
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("hdrl") && s.contains("movi") && s.contains("idx1"))
    assert(s.contains("MJPG") && s.contains("vids"))
  }

  test("headerMeta: dimensions, frame count, duration") {
    assert(Avi.headerMeta(avi).contains((32, 24, 5L, 5L * 200000L / 1000L)))
    assert(Avi.countFrames(avi).contains(5))
    assert(Avi.headerMeta("RIFFxxxxWAVE1234".getBytes("US-ASCII")).isEmpty)
  }

  test("decodeFrames: every frame decodes at source size, in order") {
    val frames = Avi.decodeFrames(avi).get
    assert(frames.length == 5)
    frames.zip(levels).foreach { case (f, lvl) =>
      assert(f.width == 32 && f.height == 24)
      // flat-field mean must sit within JPEG quantization of the level
      val mean = (0 until f.width * f.height * 3)
        .map(i => f.pixels(i) & 0xff).sum.toDouble / (f.width * f.height * 3)
      assert(math.abs(mean - lvl) < 4, s"frame level $lvl decoded mean $mean")
    }
  }

  test("odd-sized JPEG payloads stay word-aligned (walk survives)") {
    // quality sweep changes payload sizes; all must still parse
    (1 to 4).foreach { q =>
      val a = Avi.encode(levels.take(3).map(frame(_, 17, 13)), quality = q * 20)
      assert(Avi.countFrames(a).contains(3), s"quality ${q * 20}")
      assert(Avi.decodeFrames(a).get.length == 3)
    }
  }

  test("Multimodal: AVI metadata, real frame sampling, real resize") {
    val (t, _, w, h, ms) = Multimodal.decodeMeta(avi)
    assert((t, w, h, ms) == (("video", 32, 24, 1000L)))
    val sampled = Multimodal.sampleFrames(avi, 2)
    assert(sampled.length == 2)
    sampled.foreach { png =>
      val img = Png.decode(png).get
      assert(img.width == 32 && img.height == 24)
    }
    val half = Multimodal.resizeMedia(avi, 2)
    assert(Avi.headerMeta(half).exists(m => m._1 == 16 && m._2 == 12))
    assert(Avi.countFrames(half).contains(5))
    // resize must PRESERVE the source frame rate — re-encoding at a
    // default fps would silently halve/double the clip duration
    assert(Avi.fps(avi).contains(5) && Avi.fps(half).contains(5))
    assert(Avi.headerMeta(half).map(_._4) == Avi.headerMeta(avi).map(_._4))
  }

  test("corrupt frame is skipped, not fatal; garbage returns None") {
    val broken = avi.clone()
    // find the first 00dc payload and stomp its JPEG signature
    val s = new String(broken, "ISO-8859-1")
    val at = s.indexOf("00dc")
    broken(at + 8) = 0x00 // kill the FFD8 SOI of frame 1
    val frames = Avi.decodeFrames(broken).get
    assert(frames.length == 4) // 4 of 5 survive
    assert(Avi.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Avi.decodeFrames(null).isEmpty)
  }
}
