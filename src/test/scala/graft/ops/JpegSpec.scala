package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** Real baseline JPEG codec, cross-validated against an INDEPENDENT
  * implementation (the JDK's ImageIO, libjpeg-derived): our decoder must
  * reproduce ImageIO's pixels from ImageIO-encoded streams, and ImageIO
  * must read back our encoder's streams. Tolerances cover IDCT rounding
  * and ImageIO's fancy (triangle) chroma upsampling vs our nearest. */
class JpegSpec extends AnyFunSuite {

  private def rgbImage(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def toJpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  /** (max, mean) absolute channel difference vs ImageIO's own decode. */
  private def diffVsImageIO(jpeg: Array[Byte], ours: Png.Image): (Int, Double) = {
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ref.getWidth == ours.width && ref.getHeight == ours.height)
    var maxD = 0; var sum = 0L; var n = 0L
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val refC =
        if (ours.channels == 1) {
          // raw raster sample — getRGB would gamma-convert linear gray to sRGB
          Seq(ref.getRaster.getSample(x, y, 0))
        } else {
          val rgb = ref.getRGB(x, y)
          Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        }
      for (c <- refC.indices) {
        val d = math.abs(refC(c) - ours.sample(x, y, c))
        maxD = math.max(maxD, d); sum += d; n += 1
      }
    }
    (maxD, sum.toDouble / n)
  }

  test("decode matches ImageIO on a grayscale image (no chroma in play)") {
    val rnd = new scala.util.Random(42)
    val jpeg = toJpeg(grayImage(24, 17)((_, _) => rnd.nextInt(256)))
    val ours = Jpeg.decode(jpeg).get
    assert(ours.channels == 1)
    val (maxD, meanD) = diffVsImageIO(jpeg, ours)
    assert(maxD <= 2, s"max diff $maxD")
    assert(meanD <= 1.0, s"mean diff $meanD")
  }

  test("decode matches ImageIO on a smooth RGB gradient (4:2:0 subsampled)") {
    val jpeg = toJpeg(rgbImage(37, 29)((x, y) =>
      (x * 6 % 256, y * 8 % 256, (x + y) * 3 % 256)))
    val ours = Jpeg.decode(jpeg).get
    assert(ours.channels == 3)
    val (maxD, meanD) = diffVsImageIO(jpeg, ours)
    // nearest vs triangle chroma upsampling differ most at block edges
    assert(maxD <= 16, s"max diff $maxD")
    assert(meanD <= 3.0, s"mean diff $meanD")
  }

  test("decode matches ImageIO on solid colors (constant chroma is exact-ish)") {
    for ((r, g, b) <- Seq((255, 0, 0), (12, 200, 99), (128, 128, 128))) {
      val jpeg = toJpeg(rgbImage(16, 16)((_, _) => (r, g, b)))
      val (maxD, _) = diffVsImageIO(jpeg, Jpeg.decode(jpeg).get)
      assert(maxD <= 3, s"rgb($r,$g,$b) max diff $maxD")
    }
  }

  test("decoded dimensions agree with the header-only fast path") {
    val jpeg = toJpeg(rgbImage(21, 13)((x, y) => (x * 9 % 256, 77, y * 17 % 256)))
    val ours = Jpeg.decode(jpeg).get
    assert(Multimodal.imageHeaderMeta(jpeg).contains(("jpeg", 21, 13)))
    assert((ours.width, ours.height) == (21, 13))
  }

  test("ImageIO reads back our encoder's stream (external interop)") {
    val img = {
      // smooth ramps (no 0↔255 wrap edges → no Gibbs ringing at quality 95)
      val px = new Array[Byte](40 * 25 * 3)
      for (y <- 0 until 25; x <- 0 until 40; c <- 0 until 3)
        px((y * 40 + x) * 3 + c) = (40 + x * 3 + y * 2 + c * 25).toByte
      Png.Image(40, 25, 3, px)
    }
    val jpeg = Jpeg.encode(img, quality = 95)
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ref != null && ref.getWidth == 40 && ref.getHeight == 25)
    // ImageIO's pixels from OUR stream ≈ the original (quality-95 loss only)
    var maxD = 0
    for (y <- 0 until 25; x <- 0 until 40) {
      val rgb = ref.getRGB(x, y)
      for ((c, refV) <- Seq((0, (rgb >> 16) & 0xff), (1, (rgb >> 8) & 0xff),
        (2, rgb & 0xff)))
        maxD = math.max(maxD, math.abs(refV - img.sample(x, y, c)))
    }
    assert(maxD <= 12, s"round-trip-through-ImageIO max diff $maxD")
  }

  test("own encode/decode round-trip: gray and rgb, odd sizes") {
    for (ch <- Seq(1, 3)) {
      val px = new Array[Byte](19 * 11 * ch)
      for (i <- px.indices) px(i) = ((i * 31 + 7) % 256).toByte
      val img = Png.Image(19, 11, ch, px)
      val back = Jpeg.decode(Jpeg.encode(img, quality = 97)).get
      assert(back.width == 19 && back.height == 11 && back.channels == ch)
      val maxD = (0 until 11).flatMap(y => (0 until 19).flatMap(x =>
        (0 until ch).map(c => math.abs(back.sample(x, y, c) - img.sample(x, y, c))))).max
      assert(maxD <= 14, s"channels=$ch max diff $maxD") // q97 quantization loss
    }
  }

  test("4:2:0 and 4:2:2 encodes: our decoder and ImageIO agree on both") {
    // smooth ramps: subsampled chroma reconstructs closely
    val px = new Array[Byte](33 * 22 * 3)
    for (y <- 0 until 22; x <- 0 until 33; c <- 0 until 3)
      px((y * 33 + x) * 3 + c) = (50 + x * 2 + y * 3 + c * 30).toByte
    val img = Png.Image(33, 22, 3, px)
    for ((s, label) <- Seq((2, 2) -> "4:2:0", (2, 1) -> "4:2:2")) {
      val jpeg = Jpeg.encode(img, quality = 92, sampling = s)
      val ours = Jpeg.decode(jpeg).get
      assert(ours.width == 33 && ours.height == 22, label)
      val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
      assert(ref != null && ref.getWidth == 33, s"$label unreadable by ImageIO")
      var maxVsSrc = 0; var maxVsRef = 0
      for (y <- 0 until 22; x <- 0 until 33) {
        val rgb = ref.getRGB(x, y)
        for ((c, refV) <- Seq((0, (rgb >> 16) & 0xff), (1, (rgb >> 8) & 0xff),
          (2, rgb & 0xff))) {
          maxVsSrc = math.max(maxVsSrc, math.abs(ours.sample(x, y, c) -
            img.sample(x, y, c)))
          maxVsRef = math.max(maxVsRef, math.abs(ours.sample(x, y, c) - refV))
        }
      }
      // chroma loss on a smooth ramp stays small; fancy-vs-nearest
      // upsampling differences dominate the ImageIO delta
      assert(maxVsSrc <= 12, s"$label vs source max diff $maxVsSrc")
      assert(maxVsRef <= 16, s"$label vs ImageIO max diff $maxVsRef")
    }
  }

  test("restart intervals: our DRI stream decodes and ImageIO agrees") {
    val px = new Array[Byte](48 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 48; c <- 0 until 3)
      px((y * 48 + x) * 3 + c) = (30 + x * 2 + y * 5 + c * 20).toByte
    val img = Png.Image(48, 16, 3, px)
    val jpeg = Jpeg.encode(img, quality = 92, restartInterval = 2)
    assert((2 until jpeg.length - 1).exists(i => // DRI marker present
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xdd))
    val ours = Jpeg.decode(jpeg).get
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ref != null && ref.getWidth == 48)
    var maxD = 0
    for (y <- 0 until 16; x <- 0 until 48) {
      val rgb = ref.getRGB(x, y)
      for ((c, refV) <- Seq((0, (rgb >> 16) & 0xff), (1, (rgb >> 8) & 0xff),
        (2, rgb & 0xff)))
        maxD = math.max(maxD, math.abs(refV - ours.sample(x, y, c)))
    }
    assert(maxD <= 4, s"restart stream: ours vs ImageIO max diff $maxD")
  }

  test("resizeMedia on a JPEG decodes, resamples, and re-emits JPEG") {
    val jpeg = toJpeg(rgbImage(32, 24)((x, y) => (x * 8 % 256, y * 10 % 256, 60)))
    val half = Multimodal.resizeMedia(jpeg, 2)
    assert(Multimodal.imageHeaderMeta(half).contains(("jpeg", 16, 12)))
    assert(Jpeg.decode(half).exists(i => i.width == 16 && i.height == 12))
  }

  test("malformed and unsupported streams return None, never throw") {
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](0x12, 0x34)).isEmpty)
    assert(Jpeg.decode(Array.fill[Byte](64)(0xff.toByte)).isEmpty)
    val good = toJpeg(grayImage(16, 16)((x, y) => (x * y) % 256))
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty) // truncated scan
    // flip a header byte to desync the marker walk
    val bad = good.clone(); bad(2) = 0x00
    assert(Jpeg.decode(bad).isEmpty)
  }
}
