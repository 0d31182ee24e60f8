package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: interleaved same-JVM sweep of the q84 PageRank floor at the
  * BENCH shape (local[4], 4 shuffle partitions) — the r9 verdict's item 3:
  * q84 is the bench's #1 at ~7 s warm, flat since r6 while everything
  * around it halved. Each variant runs the EXACT q84 query (setup join +
  * 10 fixed-point rounds); legs rotate within each rep so host drift hits
  * every variant equally.
  *
  * Usage: sbt "runMain graft.PageRankProbe /root/testdata/sf0.1 4"
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-pagerank-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()

    def edges(s: SparkSession): DataFrame = {
      val pairs = s.read.parquet(s"$sfDir/orders.parquet")
        .join(s.read.parquet(s"$sfDir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      pairs.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }

    case class V(name: String, sp: Option[Int] = None,
                 ckptEvery: Int = 5, copart: Boolean = true,
                 eager: Boolean = true, ckpt: Boolean = true,
                 bcastMax: Long = 2000000L, aqeWhilePinned: Boolean = false,
                 dstLoop: Boolean = false)
    // round-3 sweep (r11 verdict item 5): rounds 1-2 (r10 history) landed
    // nocopart+ckpt2 with the n-gated broadcast hint (5.03 s vs 6.03
    // default). The remaining floor profiled as driver re-planning +
    // janino, so round 3 tested AQE's per-stage re-plan loop — with the
    // broadcast PINNED by the hint it has nothing left to discover, and
    // the session-level off legs measured 4.51 (ckpt2) / 4.32 (ckpt1) vs
    // 5.46 on. pageRank now scopes AQE off around its loop whenever the
    // hint fires (adaptiveWhilePinned restores the old behavior); these
    // legs A/B the scoped library implementation against pinned-AQE-on
    // round-4 sweep (r17 verdict item 1): the dstLoop legs key the edge
    // checkpoint by dst so the broadcast-regime loop runs ZERO exchanges
    // per round (contrib agg rides the dst partitioning; reattach is a
    // co-partitioned SHUFFLE_HASH left join) — A/B'd against the r16
    // shipping shape (nocopart_ckpt1) and the copartition=true library
    // default the verdict asked to re-measure on the final binary.
    val variants = Seq(
      V("nocopart_ckpt1", copart = false, ckptEvery = 1),
      V("dstloop_ckpt1", copart = false, ckptEvery = 1, dstLoop = true),
      V("dstloop_ckpt2", copart = false, ckptEvery = 2, dstLoop = true),
      V("copart_ckpt1", copart = true, ckptEvery = 1))

    val times = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; v <- variants) {
      val qSession = spark.newSession()
      v.sp.foreach(p =>
        qSession.conf.set("spark.sql.shuffle.partitions", p))
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.pageRank(edges(qSession),
          checkpoint = v.ckpt, checkpointEvery = v.ckptEvery,
          copartition = v.copart, eagerCheckpoint = v.eager,
          broadcastRanksMaxNodes = v.bcastMax,
          adaptiveWhilePinned = v.aqeWhilePinned,
          dstPartitionLoop = v.dstLoop)
        .queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      qSession.catalog.clearCache()
      System.gc()
      println(f"[pr] ${v.name} rep $rep: $secs%.2f s ($n rows)")
      times(v.name) = times(v.name) :+ secs
    }
    times.foreach { case (k, ts) =>
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"[pr] MEDIAN $k: $med%.2f s over ${ts.size} reps " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
