package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the TRAINED
  * codebook the IVF/PQ docstrings point at ("production would train the
  * codebook instead; the shape is identical"). This closes that gap with
  * the same engine-exact discipline as the rest of the ANN family:
  *
  * All arithmetic is scaled-integer. Components map to
  * `floor(x·10⁶) + 2³⁰` longs — the float→double cast, the multiply and
  * the floor are correctly rounded (engine-identical), and the 2³⁰
  * offset keeps every value POSITIVE, which makes Spark's truncating
  * `div` and DuckDB's flooring `//` agree on the centroid means (they
  * differ on negatives; L2 distances are translation-invariant, so the
  * offset changes nothing else). Squared-L2 sums stay far under 2⁶³
  * (≤ dim·(2·6·10⁵)² ≈ 10¹⁴ per pair), and centroid-mean sums are
  * ≤ members·(2³⁰+10⁶) ≈ 10¹⁵ at a billion members per cell.
  *
  * Scale shape, per Lloyd round: ONE narrow corpus pass assigns cells
  * against the broadcast centroids (k·dim longs in the closure, bounded
  * by the [[Similarity.MaxCentroids]]-style `k` check — the corpus is
  * never collected), then the centroid update posexplodes (cell, i, x)
  * element rows into a hash aggregate whose map-side partials collapse
  * to ≤ k·dim rows per task — the shuffle carries parts·k·dim tiny rows
  * regardless of corpus size. Empty cells keep their previous centroid.
  *
  * Determinism: init = the k vectors at ids 0, stride, …, (k−1)·stride
  * (the [[Similarity]] stride convention; oracle rule — no rand());
  * assignment ties break to the lowest cell index; the final assignment
  * runs against the FULLY trained centroids so the reported distortion
  * is the trained codebook's. [[kmeansOracleSql]] generates the DuckDB
  * twin with the iterations unrolled as CTEs (same device as
  * `Graph.pageRankOracleSql`), bit-for-bit including the tie rules.
  */
object Kmeans {

  private val Scale = 1000000L
  private val Offset = 1L << 30

  private def toInts(v: Seq[Double]): Array[Long] = {
    val a = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      a(i) = math.floor(v(i) * Scale.toDouble).toLong + Offset
      i += 1
    }
    a
  }

  /** Integer squared-L2 over the first min-length elements. */
  private def l2(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** (nearest cell, distance) — ties keep the lowest cell index. */
  private def nearest(x: Array[Long],
                      cents: Array[Array[Long]]): (Int, Long) = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = l2(x, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Train `k` centroids with `iters` Lloyd rounds, then assign every row
    * against the trained codebook. Output: (id, cell, distortion) with
    * cell the 0-based centroid index and distortion the scaled-integer
    * squared L2 to the trained centroid. */
  /** The Lloyd-training half of [[kmeansAssign]] — exposed so the trained
    * centroid matrix (k × dim scaled-integer rows) can persist as an
    * index artifact ([[VectorIndex.buildKmeans]]) and be reused across
    * sessions instead of retrained per call. */
  private[ops] def trainCentroids(df: DataFrame, k: Int, iters: Int,
                                  centroidStride: Long, idCol: String,
                                  vecCol: String): Array[Array[Long]] = {
    require(k >= 1 && k <= Similarity.MaxCentroids,
      s"k=$k out of range 1..${Similarity.MaxCentroids}")
    require(iters >= 0, "iters must be non-negative")
    // PERSIST the scaled vectors for the TRAINING loop (r17, guide §5
    // "reused AND expensive to recompute"): init + every Lloyd round is
    // one full pass over (id, xs), and without the cache each pass
    // re-ran the parquet scan + the toInts kernel — iters+1 times. The
    // classic Lloyd shape (MLlib caches its norm-augmented input the
    // same way) recomputes gracefully on executor loss (unlike a
    // localCheckpoint), spills to disk past memory, and unpersists the
    // moment training ends — strictly within one query's lifetime, so
    // nothing persists across bench/oracle invocations. The init
    // centroids read the SAME frame (toInts in the executor is the same
    // correctly-rounded arithmetic the old driver-side map applied), so
    // the first collect both seeds the codebook and warms the cache.
    val scaled = scaledVecs(df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = scaled
        .filter(col("id") % centroidStride === 0 &&
          col("id") < centroidStride * k)
        .collect().sortBy(_.getLong(0))
        .map(r => Option(r.getSeq[Long](1)).map(_.toArray)
          .getOrElse(Array.empty[Long]))
      require(init.length == k,
        s"expected $k init vectors at $idCol = 0, $centroidStride, …; got ${init.length}")
      var cents: Array[Array[Long]] = init
      for (_ <- 1 to iters) {
        val cs = cents // stable reference for the task closure
        val cellUdf = udf { (xs: Seq[Long]) => nearest(xs.toArray, cs)._1 }
        // element rows partial-aggregate map-side to ≤ k·dim rows per task;
        // only those tiny partials shuffle, then k·dim sums come back
        val sums: Array[Row] = scaled
          .select(cellUdf(col("xs")).as("cell"),
            posexplode(col("xs")).as(Seq("i", "x")))
          .groupBy("cell", "i")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          val (cell, i) = (r.getInt(0), r.getInt(1))
          // positive operands ⇒ truncating div == floor div == DuckDB //
          if (i < next(cell).length) next(cell)(i) = r.getLong(2) / r.getLong(3)
        }
        cents = next // cells with no members kept their previous centroid
      }
      cents
    } finally scaled.unpersist(blocking = false)
  }

  private def scaledVecs(df: DataFrame, idCol: String,
                         vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      udf((v: Seq[Double]) => toInts(if (v == null) Seq.empty else v))
        .apply(col(vecCol).cast("array<double>")).as("xs"))

  /** The assignment half: one narrow pass of `df` against an
    * already-trained centroid matrix (no shuffle). */
  private[ops] def assignWithCentroids(df: DataFrame,
                                       cents: Array[Array[Long]],
                                       idCol: String,
                                       vecCol: String): DataFrame = {
    val cs = cents
    val assignUdf = udf { (xs: Seq[Long]) =>
      val (c, d) = nearest(xs.toArray, cs)
      (c.toLong, d)
    }
    scaledVecs(df, idCol, vecCol)
      .select(col("id"), assignUdf(col("xs")).as("a"))
      .select(col("id"), col("a._1").as("cell"), col("a._2").as("distortion"))
  }

  def kmeansAssign(df: DataFrame, k: Int = 8, iters: Int = 2,
                   centroidStride: Long = 50, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    assignWithCentroids(df,
      trainCentroids(df, k, iters, centroidStride, idCol, vecCol),
      idCol, vecCol)

  /** Per-cell rollup of [[kmeansAssign]]: (cell, n_members, distortion). */
  def kmeansCells(df: DataFrame, k: Int = 8, iters: Int = 2,
                  centroidStride: Long = 50, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    kmeansAssign(df, k, iters, centroidStride, idCol, vecCol)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"), sum("distortion").as("distortion"))
      .orderBy("cell")

  /** Cluster-balanced sampling over the trained cells — the "diverse
    * training mix" op: cap every k-means cell at `m` members so no dense
    * region dominates the sampled set (the cluster-then-cap recipe
    * DoReMi/SemDeDup-style curation applies between dedup and mixing).
    *
    * Determinism (the oracle contract): within a cell, rows are picked in
    * the order of a Knuth multiplicative hash of the id, reduced mod the
    * prime 10⁹+7 BEFORE the multiply so the product stays < 2⁶³ at ANY id
    * (ties → lowest id). Pure integer arithmetic — Spark and DuckDB agree
    * bit-for-bit. Scale shape: [[kmeansAssign]]'s narrow pass + ONE
    * window partitioned by cell (k cells, each a hash partition; no
    * global sort, no driver data beyond the k·dim codebook). */
  def cellBalancedSample(df: DataFrame, m: Int, k: Int = 8, iters: Int = 2,
                         centroidStride: Long = 50, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, "m (per-cell cap) must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cell")
      .orderBy(expr("((id % 1000000007) * 2654435761) % 1000000007"),
        col("id"))
    kmeansAssign(df, k, iters, centroidStride, idCol, vecCol)
      .select(col("cell"), col("id"))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= m)
      .select(col("cell"), col("id").as(idCol), col("pick_rank"))
  }

  /** Shared CTE prefix: element rows, init codebook, `iters` unrolled
    * Lloyd rounds, final assignment in CTE `a{iters+1}` (vec_id, cell,
    * dist). */
  private def assignOracleCtes(k: Int, iters: Int, stride: Long, dim: Int,
                               table: String): String = {
    val head =
      s"""WITH idx AS (SELECT unnest(generate_series(1, $dim)) AS i),
         |ex AS (SELECT vec_id, idx.i AS i,
         |         CAST(floor(embedding[idx.i]::DOUBLE * $Scale) AS BIGINT)
         |           + $Offset AS x
         |       FROM $table, idx),
         |c0 AS (SELECT CAST(vec_id // $stride AS BIGINT) AS cell, i, x
         |       FROM ex WHERE vec_id % $stride = 0
         |         AND vec_id < ${stride * k})""".stripMargin
    def assignCte(t: Int, from: String) =
      s"""d$t AS (SELECT e.vec_id, c.cell,
         |         sum((e.x - c.x) * (e.x - c.x)) AS dist
         |       FROM ex e JOIN $from c USING (i) GROUP BY 1, 2),
         |a$t AS (SELECT vec_id, cell, dist FROM (
         |         SELECT vec_id, cell, dist, row_number() OVER (
         |           PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
         |         FROM d$t) WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { t =>
      assignCte(t, s"c${t - 1}") + ",\n" +
        s"""c$t AS (SELECT a.cell, e.i, CAST(sum(e.x) // count(*) AS BIGINT) AS x
           |       FROM a$t a JOIN ex e USING (vec_id) GROUP BY 1, 2
           |       UNION ALL
           |       SELECT cell, i, x FROM c${t - 1}
           |       WHERE cell NOT IN (SELECT DISTINCT cell FROM a$t))""".stripMargin
    }
    val fin = assignCte(iters + 1, s"c$iters")
    (Seq(head) ++ rounds ++ Seq(fin)).mkString(",\n")
  }

  /** DuckDB twin of [[kmeansCells]]: iterations unrolled as CTEs over
    * element rows (vec_id, i, x). `table` must carry (vec_id, embedding
    * list of `dim` floats). */
  def kmeansOracleSql(k: Int, iters: Int, stride: Long, dim: Int,
                      table: String = "embeddings"): String =
    assignOracleCtes(k, iters, stride, dim, table) +
      s"""
         |SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(dist) AS BIGINT) AS distortion
         |FROM a${iters + 1} GROUP BY cell ORDER BY cell""".stripMargin

  /** DuckDB twin of [[cellBalancedSample]] (same CTE prefix, same hash
    * order, same tie rule). */
  def cellBalancedSampleOracleSql(m: Int, k: Int, iters: Int, stride: Long,
                                  dim: Int,
                                  table: String = "embeddings"): String =
    assignOracleCtes(k, iters, stride, dim, table) +
      s"""
         |SELECT cell, vec_id, pick_rank FROM (
         |  SELECT cell, vec_id, CAST(row_number() OVER (
         |      PARTITION BY cell
         |      ORDER BY ((vec_id % 1000000007) * 2654435761) % 1000000007,
         |        vec_id) AS INT) AS pick_rank
         |  FROM a${iters + 1})
         |WHERE pick_rank <= $m ORDER BY cell, pick_rank""".stripMargin
}
