package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sized parquet writing: file counts bounded both ways. */
class ParquetSinkSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir))
  }

  test("writeSized: row target controls output file count, data intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_psink").toString
    val df = spark.range(10000).withColumn("v", col("id") * 2)
    ParquetSink.writeSized(df, out, targetRowsPerFile = 2500)
    val files = parquetFiles(out)
    // 10000 rows / 2500 target = 4 shuffle partitions -> exactly 4 files
    assert(files.size == 4, s"got ${files.size} files")
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("writeSized: hive partitions co-located, hot partition still splits") {
    val out = java.nio.file.Files.createTempDirectory("graft_psink2").toString
    // skewed stratum: 9000 rows in 'a', 1000 in 'b'
    val df = spark.range(10000)
      .withColumn("part", when(col("id") < 9000, "a").otherwise("b"))
    ParquetSink.writeSized(df, out, partitionCols = Seq("part"),
      targetRowsPerFile = 2500)
    val aFiles = parquetFiles(s"$out/part=a")
    val bFiles = parquetFiles(s"$out/part=b")
    assert(aFiles.size > 1, "hot partition written by a single task")
    assert(bFiles.size >= 1)
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("stratified sample: deterministic, proportions honored") {
    import spark.implicits._
    val df = spark.range(100000)
      .withColumn("stratum", when(col("id") % 2 === 0, "keep_half")
        .otherwise("keep_tenth"))
    val sampled = graft.ops.Curation.stratifiedSample(df, "id", "stratum",
      Map("keep_half" -> 500, "keep_tenth" -> 100))
    val counts = sampled.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("keep_half") - 25000L) < 1500,
      s"keep_half ${counts("keep_half")}")
    assert(math.abs(counts("keep_tenth") - 5000L) < 800,
      s"keep_tenth ${counts("keep_tenth")}")
    // exact determinism across partitionings
    val again = graft.ops.Curation.stratifiedSample(df.repartition(7),
      "id", "stratum", Map("keep_half" -> 500, "keep_tenth" -> 100))
    assert(again.exceptAll(sampled).count() == 0)
  }
}
