package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotal matches the naive single-task window") {
    val df = (1 to 500).map(i => (i.toLong, ((i * 37) % 100 + 1).toLong))
      .toDF("id", "size")
    val got = Layout.runningTotal(df,
      Seq(col("size").desc, col("id")), col("size"), "cum", numParts = 7)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("cum",
      sum("size").over(Window.orderBy(col("size").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("runningTotal's wide window partitions by the range bucket " +
    "(never a single-task global sort on the data)") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "size")
    val plan = Layout.runningTotal(df, Seq(col("size"), col("id")),
      col("size"), "cum").queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_pid"),
      s"expected the data-side window keyed by _pid:\n$plan")
  }

  test("compactionBins: every bin but the last lands within one file of " +
    "target; sizes and counts conserved") {
    val files = (1 to 300).map(i => (i.toLong, ((i * 53) % 4000 + 100).toLong))
      .toDF("doc_id", "n_chars")
    val bins = Layout.compactionBins(files, "doc_id", "n_chars", 8192L)
      .as[(Long, Long, Long)].collect()
    assert(bins.map(_._2).sum === 300L)
    assert(bins.map(_._3).sum === files.agg(sum("n_chars"))
      .as[Long].head())
    // shelf rule: a bin stops only once its cumulative size crosses the
    // target, so every non-final bin holds ≥ target bytes minus the
    // largest file and ≤ target + largest file
    val maxFile = 4099L
    bins.dropRight(1).foreach { case (bin, _, bytes) =>
      assert(bytes >= 8192L - maxFile && bytes <= 8192L + maxFile,
        s"bin $bin has $bytes bytes")
    }
  }

  test("zorderKey interleaves bits (hand examples) and SQL twin agrees") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L))
      .toDF("x", "y")
    val got = df.select(Layout.zorderKey(Seq(col("x"), col("y")), 8)
      .as("z")).as[Long].collect().toSeq
    // interleave: x bit i -> 2i, y bit i -> 2i+1
    def z(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    assert(got === Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L))
      .map { case (x, y) => z(x, y) })
    val viaSql = df.selectExpr(
      Layout.zorderKeySql(Seq("x", "y"), 8) + " AS z")
      .as[Long].collect().toSeq
    assert(viaSql === got)
  }

  test("zorderCluster: partition z-ranges are non-overlapping and both " +
    "dimensions are bounded per range (the data-skipping property)") {
    val df = (0 until 1024).map { i =>
      ((i * 7919) % 64L, (i * 104729) % 64L)
    }.toDF("x", "y")
    val clustered = Layout.zorderCluster(df,
      Seq(col("x"), col("y")), bits = 6, numParts = 8)
    val ranges = clustered
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 6))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"),
        (max("x") - min("x")).as("xw"), (max("y") - min("y")).as("yw"))
      .orderBy("p")
      .as[(Int, Long, Long, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _, _), (_, lo2, _, _, _)) =>
        assert(hi1 <= lo2, "partition z-ranges overlap")
      case _ =>
    }
    // a contiguous z-range bounds each dim: an eighth of the z-space has
    // dim spans well under the global 0..63 — allow generous slack, the
    // point is that NEITHER dimension spans the full domain everywhere
    assert(ranges.forall { case (_, _, _, xw, yw) => xw < 64 && yw < 64 })
    assert(ranges.map(_._4).min < 32 && ranges.map(_._5).min < 32,
      "z-clustering should tighten at least some partitions' dim spans")
  }

  test("zorderCluster refuses a dimension outside [0, 2^bits) instead of " +
    "silently truncating high bits away") {
    val over = Seq((0L, 1L), (5L, 64L)).toDF("x", "y") // y=64 needs 7 bits
    val e = intercept[IllegalArgumentException] {
      Layout.zorderCluster(over, Seq(col("x"), col("y")), bits = 6)
    }
    assert(e.getMessage.contains("dimension 1") &&
      e.getMessage.contains("bits"), e.getMessage)
    val neg = Seq((-1L, 1L)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorderCluster(neg, Seq(col("x"), col("y")), bits = 6)
    }
    assert(e2.getMessage.contains("dimension 0"))
  }

  test("writePartitioned: reader filtering the partition column prunes " +
    "at the source (PartitionFilters, not data filters)") {
    val dir = java.nio.file.Files.createTempDirectory("hivepart").toFile
    dir.deleteOnExit()
    val df = (0 until 1000).map(i => (i.toLong, s"d${i % 7}", i * 2.0))
      .toDF("id", "day", "v")
    Layout.writePartitioned(df, dir.getAbsolutePath, "day")
    // one directory per partition value
    val dirs = dir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length === 7 && dirs.forall(_.startsWith("day=")))
    val back = spark.read.parquet(dir.getAbsolutePath)
      .filter(col("day") === "d3")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      s"day filter should prune partitions:\n$plan")
    assert(back.count() === 1000 / 7 + (if (3 < 1000 % 7) 1 else 0))
  }

  test("writeBucketed: join of two co-bucketed tables runs with NO " +
    "shuffle exchange (the write-once / join-free-forever trade)") {
    val a = (0 until 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 500).map(i => (i.toLong, i * 10.0)).toDF("k", "vb")
    Layout.writeBucketed(a, "layout_bucket_a", "k", 8)
    Layout.writeBucketed(b, "layout_bucket_b", "k", 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("layout_bucket_a")
        .join(spark.table("layout_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS layout_bucket_a")
      spark.sql("DROP TABLE IF EXISTS layout_bucket_b")
    }
  }
}
