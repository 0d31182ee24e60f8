package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) needs
  * native libraries this container does not ship — those kernels are STUBBED
  * with deterministic fakes (clearly marked below). Everything Spark-side is
  * real and tested: schemas, batch iteration via `mapPartitions` on the
  * binary column (the Scala analog of `mapInPandas` batch shape),
  * partitioning, and the metadata contract.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** ======== STUB: deterministic fake decoder ========
    * Real implementation would dispatch on magic bytes to an image/audio
    * codec. The fake derives metadata purely from the byte content so tests
    * are reproducible. */
  def fakeDecodeMeta(bytes: Array[Byte]): (String, Long, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) return ("empty", 0L, 0, 0, 0L)
    val b0 = bytes(0) & 0xff
    val mediaType = if (b0 % 3 == 0) "image" else if (b0 % 3 == 1) "audio" else "video"
    val w = 64 + (b0 % 16) * 64
    val h = 64 + ((bytes(bytes.length - 1) & 0xff) % 9) * 64
    (mediaType, bytes.length.toLong, w, h, bytes.length.toLong * 10)
  }

  private val decodeMetaUdf = udf { (bytes: Array[Byte]) =>
    val (t, n, w, h, d) = fakeDecodeMeta(bytes)
    (t, n, w, h, d)
  }

  /** Attach decoded metadata struct to a binary column. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta",
      decodeMetaUdf(col(binCol)).cast(
        "struct<media_type:string,n_bytes:bigint,width:int,height:int,duration_ms:bigint>"))

  /** ======== STUB kernel: "resize" = deterministic byte subsample ======== */
  def fakeResize(bytes: Array[Byte], factor: Int): Array[Byte] =
    if (bytes == null) null
    else bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

  /** ======== STUB kernel: frame sampling = fixed-stride byte windows ==== */
  def fakeFrameSample(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val stride = math.max(1, bytes.length / math.max(1, nFrames))
    (0 until math.min(nFrames, bytes.length)).map { f =>
      bytes.slice(f * stride, math.min(f * stride + 16, bytes.length))
    }
  }

  /** Batch feature extraction over partitions — the `mapInPandas` analog:
    * one iterator pass per partition, batching amortizes codec setup. Output
    * schema: id, media_type, n_bytes, feature (fixed-width double vector
    * from the stub "decoder"). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val input = df.select(col(idCol).cast("long"), col(binCol))
    val rows = input.rdd.mapPartitions { it =>
      // per-partition setup happens once (real codecs would init here)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (t, n, _, _, _) = fakeDecodeMeta(bytes)
        // STUB feature: byte-histogram projection, deterministic
        val feat = new Array[Double](dim)
        if (bytes != null) bytes.foreach { b => feat((b & 0xff) % dim) += 1.0 }
        val total = math.max(1.0, if (bytes == null) 1.0 else bytes.length.toDouble)
        Row(id, t, n, feat.map(v => v / total).toSeq)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Demo source: synthesize a binary media column from text (UTF-8 bytes)
    * — stands in for `spark.read.format("binaryFile")` on real assets. */
  def synthesizeBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("media_bytes"))
}
