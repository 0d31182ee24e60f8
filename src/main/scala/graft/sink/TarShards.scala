package graft.sink

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the de-facto interchange format for
  * multimodal training corpora: each shard is a plain POSIX tar whose
  * entries group by basename (`000123.txt`, `000123.jpg`, `000123.json`
  * = one sample), so any loader (or plain `tar -x`) can stream samples
  * sequentially with zero index structures.
  *
  * The tar container is hand-rolled here like the other MiniFormats
  * codecs (ustar is 512-byte headers + padded payloads — no library
  * needed), and the Spark sink writes ONE tar per shard partition in the
  * executors via the Hadoop FileSystem API (cluster filesystems work;
  * the driver's conf is shipped in the task closure — never a driver
  * collect). Shard assignment is by a caller-provided shard column, so
  * upstream `repartition(shardCol)` co-locates each shard's samples.
  */
object TarShards {

  // ---------- ustar codec ----------

  private def headerBlock(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"tar name too long: $name")
    val b = new Array[Byte](512)
    def put(at: Int, s: String, max: Int = 99): Unit = {
      val bytes = s.getBytes("US-ASCII")
      System.arraycopy(bytes, 0, b, at, math.min(bytes.length, max))
    }
    def putOctal(at: Int, len: Int, v: Long): Unit =
      put(at, ("%0" + (len - 1) + "o").format(v))
    // the ustar name field is 100 bytes and needs no NUL terminator when
    // full — a 99 cap would silently truncate an exactly-100-byte name
    put(0, name, max = 100)
    putOctal(100, 8, 420)   // mode 0644
    putOctal(108, 8, 0)     // uid
    putOctal(116, 8, 0)     // gid
    putOctal(124, 12, size)
    putOctal(136, 12, 0L)   // mtime: fixed 0 → byte-reproducible shards
    b(156) = '0'            // typeflag: regular file
    put(257, "ustar")       // magic (+ NUL from the zeroed array)
    b(263) = '0'; b(264) = '0' // version "00"
    // checksum computed with the checksum field itself as spaces
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    val sum = b.map(_ & 0xff).sum
    put(148, "%06o".format(sum))
    b(154) = 0; b(155) = ' '
    b
  }

  /** Serialize (name, bytes) entries as a POSIX ustar archive. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      out.write(headerBlock(name, data.length.toLong))
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero blocks = end of archive
    out.toByteArray
  }

  /** Parse a tar archive back to (name, bytes) entries — reads any
    * producer's ustar/GNU output (longname entries unsupported → None). */
  def tarEntries(bytes: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    if (bytes == null || bytes.length < 1024) return None
    try {
      val out = Seq.newBuilder[(String, Array[Byte])]
      var i = 0
      while (i + 512 <= bytes.length) {
        if (bytes(i) == 0) return Some(out.result()) // zero block: done
        val nameEnd0 = bytes.indexWhere(_ == 0, i)
        val nameEnd = if (nameEnd0 < 0 || nameEnd0 > i + 100) i + 100 else nameEnd0
        val name = new String(bytes, i, nameEnd - i, "UTF-8")
        if (name.startsWith("././@LongLink")) return None
        val sizeStr = new String(bytes, i + 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        val size = if (sizeStr.isEmpty) 0L else
          java.lang.Long.parseLong(sizeStr, 8)
        val typeflag = bytes(i + 156)
        if (i + 512 + size > bytes.length) return None
        if (typeflag == '0' || typeflag == 0)
          out += name -> java.util.Arrays.copyOfRange(
            bytes, i + 512, i + 512 + size.toInt)
        i += 512 + ((size + 511) / 512).toInt * 512
      }
      Some(out.result())
    } catch { case _: Exception => None }
  }

  // ---------- Spark sink / scan ----------

  /** Write one tar per shard. `df` must have columns `shardCol` (long),
    * `nameCol` (entry name, unique per shard) and `bytesCol` (binary).
    * Entries are sorted by name within a shard (WebDataset sample
    * grouping) via a repartition + in-partition sort, so each tar is
    * byte-deterministic. */
  def writeShards(df: DataFrame, dir: String, shardCol: String,
                  nameCol: String, bytesCol: String): Unit = {
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(shardCol).cast("long").as("_shard"),
        col(nameCol).cast("string").as("_name"), col(bytesCol).as("_bytes"))
      .repartition(col("_shard"))
      .sortWithinPartitions("_shard", "_name")
      .foreachPartition { (it: Iterator[Row]) =>
        // one partition may hold several (small) shards after hashing —
        // group in-memory per shard; entries are pre-sorted
        val byShard = scala.collection.mutable.LinkedHashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]]
        it.foreach { r =>
          byShard.getOrElseUpdate(r.getLong(0),
            scala.collection.mutable.ArrayBuffer.empty) +=
            (r.getString(1) -> r.getAs[Array[Byte]](2))
        }
        byShard.foreach { case (shard, entries) =>
          val p = new org.apache.hadoop.fs.Path(
            f"$dir/shard-$shard%06d.tar")
          val fs = p.getFileSystem(hconf.value)
          val out = fs.create(p, true)
          try out.write(tarBytes(entries.toSeq))
          finally out.close()
        }
      }
  }

  /** Scan a directory of tar shards back to (shard, name, bytes) rows —
    * `binaryFile` source + a per-file entry explode. */
  def readShards(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = {
    import spark.implicits._
    val entriesUdf = udf { (path: String, content: Array[Byte]) =>
      val shard = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(path)
        .map(_.group(1).toLong).getOrElse(-1L)
      tarEntries(content).getOrElse(Seq.empty)
        .map { case (n, b) => (shard, n, b) }
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(explode(entriesUdf(col("path"), col("content"))).as("e"))
      .select(col("e._1").as("shard"), col("e._2").as("name"),
        col("e._3").as("bytes"))
  }
}
