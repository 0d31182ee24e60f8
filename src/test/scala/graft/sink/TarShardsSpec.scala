package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** WebDataset-style tar shards: byte round-trip, EXTERNAL interop with
  * GNU tar in both directions, and the distributed write/scan pair. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "000001.txt" -> "hello world".getBytes("UTF-8"),
    "000001.json" -> """{"id":1}""".getBytes("UTF-8"),
    "000002.txt" -> ("x" * 700).getBytes("UTF-8"), // > 1 block, padding
    "000002.bin" -> Array.tabulate(513)(_.toByte))

  test("tar round-trip: our writer, our reader") {
    val back = TarShards.tarEntries(TarShards.tarBytes(samples)).get
    assert(back.map(_._1) == samples.map(_._1))
    back.zip(samples).foreach { case ((_, b), (_, exp)) =>
      assert(b.sameElements(exp))
    }
  }

  test("exactly-100-byte entry names round-trip (full ustar name field)") {
    val name100 = "d/" + "a" * 94 + ".txt" // 100 bytes, no NUL needed
    assert(name100.getBytes("UTF-8").length == 100)
    val back = TarShards.tarEntries(
      TarShards.tarBytes(Seq(name100 -> "payload".getBytes("UTF-8")))).get
    assert(back.map(_._1) == Seq(name100))
    assert(back.head._2.sameElements("payload".getBytes("UTF-8")))
  }

  test("external interop: GNU tar extracts our shard; we read GNU tar's") {
    val dir = Files.createTempDirectory("tarspec")
    // ours → GNU tar
    val ours = dir.resolve("ours.tar")
    Files.write(ours, TarShards.tarBytes(samples))
    val extractDir = Files.createDirectory(dir.resolve("x"))
    assert(Seq("tar", "-xf", ours.toString, "-C", extractDir.toString).! == 0,
      "GNU tar could not extract our archive")
    samples.foreach { case (name, bytes) =>
      assert(Files.readAllBytes(extractDir.resolve(name)).sameElements(bytes),
        s"$name corrupted through GNU tar")
    }
    // GNU tar → ours
    val theirs = dir.resolve("theirs.tar")
    assert(Seq("tar", "--format=ustar", "-cf", theirs.toString,
      "-C", extractDir.toString) ++ samples.map(_._1) != null)
    assert((Seq("tar", "--format=ustar", "-cf", theirs.toString,
      "-C", extractDir.toString) ++ samples.map(_._1)).! == 0)
    val read = TarShards.tarEntries(Files.readAllBytes(theirs)).get.toMap
    samples.foreach { case (name, bytes) =>
      assert(read(name).sameElements(bytes), s"$name differs via GNU tar")
    }
  }

  test("distributed shard write + scan round-trips samples by shard") {
    val dir = Files.createTempDirectory("tarshards").toString
    val df = spark.range(20).select(
      (col("id") / 7).cast("long").as("shard"),
      format_string("%06d.txt", col("id")).as("name"),
      encode(concat(lit("doc "), col("id")), "UTF-8").as("bytes"))
    TarShards.writeShards(df, dir, "shard", "name", "bytes")
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tar")).sorted
    assert(files.toSeq == Seq("shard-000000.tar", "shard-000001.tar",
      "shard-000002.tar"), files.mkString(","))
    val back = TarShards.readShards(spark, dir)
      .select("shard", "name", "bytes")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(back.length == 20)
    assert(back.forall { case (shard, name, text) =>
      val id = name.stripSuffix(".txt").toLong
      shard == id / 7 && text == s"doc $id"
    }, back.take(5).mkString(","))
    // entries inside a shard are name-sorted (WebDataset sample grouping)
    val inShard0 = TarShards.tarEntries(Files.readAllBytes(
      Paths.get(dir, "shard-000000.tar"))).get.map(_._1)
    assert(inShard0 == inShard0.sorted)
  }
}
