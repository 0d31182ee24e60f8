package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: decompose the bench's ~2–2.5 s "floor family" (q19/q39/q89/
  * q96/q98 — multi-stage dedup/eval DAGs over the 5,000-doc sf0.1
  * corpus) into DRIVER planning vs EXECUTION at the exact bench shape
  * (fresh `newSession` per rep, same confs). Motivation: jstack sampling
  * of the warm q96/q19 loop found executor workers parked in ~87% of
  * samples and the driver's main thread inside `QueryExecution.lazyToRdd`
  * (physical planning) in most active samples — suggesting the family's
  * wall is the per-session analyze/optimize/plan/codegen pipeline plus
  * stage round-trips, not task compute, at this data size.
  *
  * Legs per rep, each on a fresh session (the bench's isolation):
  *  - `plan`: build the query DataFrame and force `executedPlan`
  *    (analysis + optimization + physical planning + AQE prep; NO jobs)
  *  - `full`: the bench's `toRdd.count()` (planning + execution)
  * The floor claim holds if plan ≈ a large fraction of full and full
  * minus plan ≈ the executor-busy time the stacks show.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchFloorProbe /root/testdata/sf0.1 5"
  */
object BenchFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bench-floor")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).count()

    val queries = Seq("q19_ngram_jaccard", "q39_dup_clusters",
      "q89_jaccard_deciles", "q96_lsh_quality", "q98_langid_trained")
    val acc = scala.collection.mutable.LinkedHashMap[String, (List[Double],
      List[Double])]().withDefaultValue((Nil, Nil))
    for (rep <- 1 to reps; name <- queries) {
      val q = SparkEntry.queries(name)
      val s1 = spark.newSession()
      val t0 = System.nanoTime()
      q(s1, sfDir).queryExecution.executedPlan
      val planS = (System.nanoTime() - t0) / 1e9
      val s2 = spark.newSession()
      val t1 = System.nanoTime()
      q(s2, sfDir).queryExecution.toRdd.count()
      val fullS = (System.nanoTime() - t1) / 1e9
      // third leg: same cores, NARROW shuffle width — if the family is
      // stage-dispatch-bound (many sequential short stages of tiny
      // tasks), fewer tasks per stage should shave the fixed cost; if
      // it is kernel-bound, narrowing loses parallelism and regresses
      val s3 = spark.newSession()
      s3.conf.set("spark.sql.shuffle.partitions", "8")
      val t2 = System.nanoTime()
      q(s3, sfDir).queryExecution.toRdd.count()
      val narrowS = (System.nanoTime() - t2) / 1e9
      println(f"[floor] $name rep $rep: plan $planS%.2f s  " +
        f"full $fullS%.2f s  narrow8 $narrowS%.2f s")
      val (ps, fs) = acc(name)
      acc(name) = (ps :+ planS, fs :+ fullS)
      val key = s"$name/narrow"
      val (ns, _) = acc(key)
      acc(key) = (ns :+ narrowS, Nil)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    queries.foreach { name =>
      val (ps, fs) = acc(name)
      val (ns, _) = acc(s"$name/narrow")
      println(f"[floor] $name MEDIAN: plan ${med(ps)}%.2f s  " +
        f"full ${med(fs)}%.2f s  narrow8 ${med(ns)}%.2f s  " +
        f"(plan share ${100 * med(ps) / med(fs)}%.0f%%)")
    }
    spark.stop()
  }
}
