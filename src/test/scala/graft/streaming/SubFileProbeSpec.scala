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
    val meta = spark.sparkContext.longAccumulator("m")
    val got = SubFileProbe.read(spark,
        Seq(SubFileProbe.FileKeys(dir, keys.sorted)), bytes, files, meta)
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
        Seq(SubFileProbe.FileKeys(dir, present :+ 1L)), bytes, files,
        spark.sparkContext.longAccumulator("m"))
      .collect().map(_.getLong(0)).sorted // key 1L is absent (hash range)
    assert(got.toSeq === present.toSeq)
  }

  test("MetaCache (r14 verdict item 1): a repeated probe re-reads ZERO " +
    "footer/index bytes — the warm read pays pages only, byte-identical " +
    "to the cold read's page side; absent keys on a warm cache open " +
    "NOTHING at all") {
    val dir = writeSorted(200000L)
    val keys = Array(3L, 77777L, 123456L, 199999L)
    def probe(ks: Array[Long]) = {
      val pages = spark.sparkContext.longAccumulator("p")
      val files = spark.sparkContext.longAccumulator("f")
      val meta = spark.sparkContext.longAccumulator("m")
      val rows = SubFileProbe.read(spark,
        Seq(SubFileProbe.FileKeys(dir, ks)), pages, files, meta)
        .collect().length
      (rows, pages.value.toLong, files.value.toLong, meta.value.toLong)
    }
    // cold: one open loads footer + page indexes (meta bytes) and reads
    // the keys' pages
    val m0 = SubFileProbe.MetaCache.missCount
    val (rows1, pages1, files1, meta1) = probe(keys)
    assert(rows1 === 4 && files1 === 1L)
    assert(SubFileProbe.MetaCache.missCount === m0 + 1)
    assert(meta1 > 0L && pages1 > 0L)
    // warm: zero footer/index re-reads, pages byte-identical
    val (rows2, pages2, files2, meta2) = probe(keys)
    assert(rows2 === 4 && files2 === 1L)
    assert(SubFileProbe.MetaCache.missCount === m0 + 1,
      "a repeated probe must not re-load the immutable file's metadata")
    assert(meta2 === 0L,
      s"warm probe must read zero metadata bytes, got $meta2")
    assert(pages2 === pages1,
      s"warm page reads must be byte-identical ($pages2 vs $pages1)")
    // absent keys, warm cache: the plan is answered from memory and the
    // file is NEVER OPENED — the zero-I/O skip that pays for the cache
    val (rows3, pages3, files3, meta3) = probe(Array(500000L, 600000L))
    assert(rows3 === 0 && files3 === 0L && pages3 === 0L && meta3 === 0L,
      s"all-miss warm probe must do zero I/O ($rows3/$pages3/$files3/$meta3)")
  }

  test("MetaCache staleness: a REWRITTEN file at the same path serves " +
    "the NEW generation's rows — the modificationTime in the cache key " +
    "makes a same-path delete+recreate rigorous, not probabilistic") {
    import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}
    def partFileOf(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .head.toPath
    def gen(occConst: Long): java.nio.file.Path = {
      val d = java.nio.file.Files
        .createTempDirectory("graft_subfile_gen_").toString + "/data"
      spark.range(1000L)
        .select(col("id").as("shingle"), lit(occConst).as("occ"))
        .coalesce(1).sortWithinPartitions("shingle")
        .write.parquet(d)
      partFileOf(d)
    }
    val target = java.nio.file.Files
      .createTempDirectory("graft_subfile_stale_").toString + "/fixed.parquet"
    JFiles.createDirectories(JPaths.get(target).getParent)
    JFiles.copy(gen(1L), JPaths.get(target),
      StandardCopyOption.REPLACE_EXISTING)
    def probe(): Seq[(Long, Long)] = SubFileProbe.read(spark,
      Seq(SubFileProbe.FileKeys(target, Array(500L))),
      spark.sparkContext.longAccumulator("p"),
      spark.sparkContext.longAccumulator("f"),
      spark.sparkContext.longAccumulator("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probe() === Seq((500L, 1L)))
    // same path, same row count, different content — constant-column
    // zstd parquet typically lands the SAME byte length, so only the
    // mtime distinguishes the generations
    Thread.sleep(20) // ensure a distinct mtime at ms granularity
    JFiles.copy(gen(7L), JPaths.get(target),
      StandardCopyOption.REPLACE_EXISTING)
    val misses = SubFileProbe.MetaCache.missCount
    assert(probe() === Seq((500L, 7L)),
      "the rewritten file must serve its own rows, not the cached " +
        "generation's")
    assert(SubFileProbe.MetaCache.missCount === misses + 1,
      "the new generation must have loaded fresh metadata")
  }

  test("MetaCache.dropPrefix is scheme-blind but AUTHORITY-preserving " +
    "(r15 verdict item 6): two buckets with equal paths cannot " +
    "cross-drop; unqualified and file:-qualified local forms still " +
    "match each other") {
    // key-matching only — the entries are never dereferenced, so a null
    // footer stands in for real metadata
    def fake() = SubFileProbe.MetaCache.Entry(null, Array.empty, 64L)
    val ks = Seq("s3://bucketA/x/part-0.parquet",
      "s3://bucketB/x/part-0.parquet",
      "file:/tmp/graft_dp_test/q/part-0.parquet",
      "/tmp/graft_dp_test/q/part-1.parquet")
    ks.foreach(k => SubFileProbe.MetaCache.put(k, 1L, 1L, fake()))
    def live(k: String) = SubFileProbe.MetaCache.get(k, 1L, 1L).isDefined
    assert(ks.forall(live))
    // authority-qualified prefix: drops ONLY its own bucket
    SubFileProbe.MetaCache.dropPrefix("s3://bucketA/x")
    assert(!live(ks(0)), "own-bucket entry must drop")
    assert(live(ks(1)), "same path in ANOTHER bucket must survive")
    // authority-less prefix: matches both local spellings, never a bucket
    SubFileProbe.MetaCache.dropPrefix("/tmp/graft_dp_test/q")
    assert(!live(ks(2)) && !live(ks(3)),
      "file:-qualified and unqualified local keys must both drop")
    assert(live(ks(1)), "an authority-less prefix must not touch buckets")
    SubFileProbe.MetaCache.dropPrefix("s3://bucketB/x") // cleanup
  }

  test("over-cap key sets fall back to the whole file (correct " +
    "superset); empty spec list returns an empty frame") {
    val dir = writeSorted(5000L)
    val many = (0L until (SubFileProbe.MaxFilterKeysPerFile + 1L)).toArray
    val bytes = spark.sparkContext.longAccumulator("b")
    val files = spark.sparkContext.longAccumulator("f")
    val got = SubFileProbe.read(spark,
      Seq(SubFileProbe.FileKeys(dir, many)), bytes, files,
      spark.sparkContext.longAccumulator("m"))
    // unfiltered fallback: every row of the file comes back
    assert(got.count() === 5000L)
    assert(SubFileProbe.read(spark, Seq.empty,
      spark.sparkContext.longAccumulator,
      spark.sparkContext.longAccumulator,
      spark.sparkContext.longAccumulator).count() === 0L)
  }
}
