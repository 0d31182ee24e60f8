package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the tier-4 per-file probe reader, independent of the
  * store integration (StreamingSpanDedupSpec pins that end): exactness
  * of the per-file predicate read, the over-cap whole-file fallback,
  * byte accounting, and page-level selectivity on a sorted file. */
class SubFileProbeSpec extends SparkSpec {
  import spark.implicits._

  private def writeSorted(n: Long): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_subfile_").toString + "/data"
    spark.range(n)
      .select(col("id").as("shingle"), (col("id") % 7 + 1).as("occ"))
      .coalesce(1).sortWithinPartitions("shingle")
      .write.option("parquet.page.row.count.limit",
        OccStateStore.SortedPageRows.toString)
      .parquet(dir)
    dir
  }

  test("exact read: returns precisely the present keys' rows; absent " +
    "keys return nothing; bytes are measured and page-selective") {
    val dir = writeSorted(200000L)
    val keys = Array(3L, 77777L, 123456L, 199999L, 500000L) // last absent
    val bytes = spark.sparkContext.longAccumulator("b")
    val files = spark.sparkContext.longAccumulator("f")
    val got = SubFileProbe.read(spark,
        Seq(SubFileProbe.FileKeys(dir, keys.sorted)), bytes, files)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq(3L, 77777L, 123456L, 199999L)
      .map(k => (k, k % 7 + 1)))
    assert(files.value === 1L)
    // page selectivity: 200k sorted rows ≈ 196 pages of 1024; four keys
    // want ≤ 4 — the measured bytes must be well under the file
    val fileBytes = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum
    assert(bytes.value > 0L && bytes.value < fileBytes / 4,
      s"expected a page-selective read, got ${bytes.value} of $fileBytes")
  }

  test("signed keys: real shingles are raw xxhash64 values, so the " +
    "sorted file spans negative and positive longs — per-key reads stay " +
    "exact across the sign boundary") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_subfile_neg_").toString + "/data"
    // hash-valued keys: roughly half negative, sorted as signed longs
    spark.range(100000L)
      .select(xxhash64(col("id")).as("shingle"), lit(2L).as("occ"))
      .coalesce(1).sortWithinPartitions("shingle")
      .write.option("parquet.page.row.count.limit",
        OccStateStore.SortedPageRows.toString)
      .parquet(dir)
    val present = spark.range(100000L).select(xxhash64(col("id")))
      .filter(col("xxhash64(id)") % 9999 === 0)
      .collect().map(_.getLong(0)).sorted
    assert(present.exists(_ < 0L) && present.exists(_ > 0L),
      "fixture must straddle the sign boundary")
    val bytes = spark.sparkContext.longAccumulator("b")
    val files = spark.sparkContext.longAccumulator("f")
    val got = SubFileProbe.read(spark,
        Seq(SubFileProbe.FileKeys(dir, present :+ 1L)), bytes, files)
      .collect().map(_.getLong(0)).sorted // key 1L is absent (hash range)
    assert(got.toSeq === present.toSeq)
  }

  test("over-cap key sets fall back to the whole file (correct " +
    "superset); empty spec list returns an empty frame") {
    val dir = writeSorted(5000L)
    val many = (0L until (SubFileProbe.MaxFilterKeysPerFile + 1L)).toArray
    val bytes = spark.sparkContext.longAccumulator("b")
    val files = spark.sparkContext.longAccumulator("f")
    val got = SubFileProbe.read(spark,
      Seq(SubFileProbe.FileKeys(dir, many)), bytes, files)
    // unfiltered fallback: every row of the file comes back
    assert(got.count() === 5000L)
    assert(SubFileProbe.read(spark, Seq.empty,
      spark.sparkContext.longAccumulator,
      spark.sparkContext.longAccumulator).count() === 0L)
  }
}
