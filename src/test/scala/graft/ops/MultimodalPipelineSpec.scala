package graft.ops

import graft.SparkSpec
import graft.sink.TarShards
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end multimodal lane: REAL media binaries (PNG/GIF/JPEG/WAV from
  * our own encoders) → WebDataset tar shards → scan → typed metadata +
  * feature extraction — every stage on actual decoded content. */
class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int): Array[Byte] = {
    val px = Array.tabulate(16 * 12 * 3)(i => ((i * seed + 7) % 256).toByte)
    Png.encode(Png.Image(16, 12, 3, px))
  }
  private def jpeg(seed: Int): Array[Byte] = {
    val px = Array.tabulate(24 * 16 * 3)(i => ((i / 3 + seed * 10) % 256).toByte)
    Jpeg.encode(Png.Image(24, 16, 3, px), quality = 90)
  }
  private def gif(seed: Int): Array[Byte] = {
    val px = Array.tabulate(8 * 8 * 3)(i => (((i / 3) % 4) * 60 + seed).toByte)
    Gif.encode(Png.Image(8, 8, 3, px))
  }
  private def wav(): Array[Byte] = {
    // minimal PCM WAV: 100 samples of a square wave at 8 kHz mono 16-bit
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int) = (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def w16(v: Int) = (0 to 1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); w32(36 + 200); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000)
    w32(16000); w16(2); w16(16)
    out.write("data".getBytes); w32(200)
    (0 until 100).foreach(i => w16(if ((i / 10) % 2 == 0) 12000 else -12000))
    out.toByteArray
  }

  private def avi(): Array[Byte] =
    Avi.encode((1 to 3).map(i =>
      Png.Image(16, 12, 3, Array.fill(16 * 12 * 3)((i * 70).toByte))), fps = 3)

  private def adpcmWav(): Array[Byte] = {
    val pcm = Array.tabulate(600)(i =>
      (6000 * math.sin(2 * math.Pi * i * 440 / 8000)).toInt)
    val data = Adpcm.encodeIma(pcm, 256)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int) = (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def w16(v: Int) = (0 to 1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); w32(4 + 24 + 12 + 8 + data.length)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(0x11); w16(1); w32(8000)
    w32(8000 * 256 / Adpcm.samplesPerBlock(256)); w16(256); w16(4)
    out.write("fact".getBytes); w32(4); w32(600)
    out.write("data".getBytes); w32(data.length); out.write(data)
    out.toByteArray
  }

  test("tar-sharded media corpus: metadata and features are real end-to-end") {
    val dir = Files.createTempDirectory("mmtar").toString
    val media = Seq(
      (0L, "000000.png", png(3)), (1L, "000001.jpg", jpeg(5)),
      (2L, "000002.gif", gif(9)), (3L, "000003.wav", wav()),
      (4L, "000004.avi", avi()), (5L, "000005_adpcm.wav", adpcmWav()))
    val df = media.toDF("id", "name", "bytes")
      .withColumn("shard", col("id") % 2)
    TarShards.writeShards(df, dir, "shard", "name", "bytes")

    val scanned = TarShards.readShards(spark, dir)
    assert(scanned.count() == 6)
    val meta = Multimodal.withMediaMeta(scanned, "bytes")
      .select(col("name"), col("media_meta.media_type"),
        col("media_meta.width"), col("media_meta.height"),
        col("media_meta.duration_ms"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(meta("000000.png") == (("image", 16, 12, 0L)))
    assert(meta("000001.jpg") == (("image", 24, 16, 0L)))
    assert(meta("000002.gif") == (("image", 8, 8, 0L)))
    // 100 samples at 16000 B/s byte rate = 200 bytes → 12 ms
    assert(meta("000003.wav")._1 == "audio" && meta("000003.wav")._4 == 12L)
    // AVI: real dimensions + duration (3 frames at 3 fps = 999 ms of µs math)
    assert(meta("000004.avi") == (("video", 16, 12, 3L * 333333L / 1000L)))
    // compressed WAV decodes through the real ADPCM codec (600 samples)
    val adpcmSamples = Multimodal.wavSamples(media(5)._3).get
    assert(adpcmSamples.length == 600)
    assert(adpcmSamples.exists(_ > 0.1) && adpcmSamples.exists(_ < -0.1))

    // features: image rows get REAL luma histograms (sum to 1 over pixels)
    val feats = Multimodal.extractFeatures(
      scanned.withColumn("id",
        regexp_extract(col("name"), "(\\d+)", 1).cast("long")),
      "id", "bytes", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    Seq(0L, 1L, 2L).foreach { id =>
      val s = feats(id).sum
      assert(math.abs(s - 1.0) < 1e-9, s"id=$id histogram sums to $s")
    }
    // resize on the JPEG sample via the real decoder chain
    val half = Multimodal.resizeMedia(media(1)._3, 2)
    assert(Multimodal.imageHeaderMeta(half).contains(("jpeg", 12, 8)))
  }
}
