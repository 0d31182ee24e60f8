package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the iterative-join workload
  * class (label propagation's spectral sibling; dupClusters covers the
  * other one). North-star extension in the SURVEY §8 sense.
  *
  * Scale shape: each iteration is ONE join of the rank frame against the
  * edge list on the source key plus ONE aggregate on the destination key
  * (the per-node degree rides through the same aggregate as a max over a
  * union'd zero-contribution row per node, so no second join reattaches
  * it) — both hash-partitioned, no windows, no driver data. `localCheckpoint`
  * truncates lineage per round so the plan never grows with the iteration
  * count (same discipline as [[Dedup.dupClusters]]). The driver loop
  * carries nothing but the iteration counter. Degrees are carried INSIDE
  * the rank frame (node, deg, rank), so the static degree table is not
  * re-joined every round.
  *
  * Fixed-point arithmetic (the oracle contract): ranks live as integer
  * "picorank" units (initial mass = 10¹² DIV n per node) and every
  * division is a floor DIV — identical in Spark and DuckDB, so after any
  * number of iterations the values match bit-for-bit. A float PageRank
  * accumulates summation-order error that a 10-round iteration amplifies
  * past any fixed rounding; deterministic mass leak is the price of an
  * exact cross-engine gate. Two leak sources, both deterministic: floor
  * division drops ≤ deg units per node per round, and — this is the
  * PageRank-WITHOUT-dangling-redistribution variant — a sink node
  * (deg = 0) simply drops its whole rank mass each round rather than
  * redistributing it uniformly. The oracle twin implements the identical
  * semantics, so results stay exact either way; callers needing the
  * mass-conserving textbook variant should add the dangling term on both
  * sides (or symmetrize the graph, as q84 does, so sinks cannot exist).
  *
  * Update rule per round, damping d = `dampingPct`/100:
  *   contrib(v) = Σ_{u→v} rank(u) DIV deg(u)
  *   rank'(v)   = ((100−d)·(10¹² DIV n)) DIV 100 + (d·contrib(v)) DIV 100
  */
object Graph {

  val Unit: Long = 1000000000000L // 10^12 picorank = total initial mass

  /** Session shuffle-partition bound under which the in-gate (broadcast-
    * pinned) loop runs with AQE scoped off — above it, AQE's coalescing
    * of the per-round aggregate exchange outweighs its re-planning cost
    * (both sides measured by PageRankProbe; see the scope note in
    * [[pageRank]]). */
  val AqeOffMaxLoopPartitions: Int = 16

  /** PageRank over directed `edges` (src, dst). Nodes = every endpoint.
    * Returns (node, rank) with rank in picorank units, sorted by node. */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               dampingPct: Int = 85, checkpoint: Boolean = true,
               checkpointEvery: Int = 5, copartition: Boolean = true,
               eagerCheckpoint: Boolean = true,
               broadcastRanksMaxNodes: Long = 2000000L,
               adaptiveWhilePinned: Boolean = false): DataFrame = {
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    // pin BOTH static frames to one hash partitioning up front — edges on
    // src, nodes on node — and every later checkpoint preserves it
    // (LogicalRDD carries outputPartitioning). Each iteration's rank⋈edges
    // join (node = src) is then co-partitioned, so at scale (where AQE
    // can't just broadcast the rank frame) EnsureRequirements re-shuffles
    // NEITHER side per round — the only per-round exchange is the contrib
    // aggregate's, genuinely required (contributions regroup by
    // destination). INSIDE the broadcast regime, though, the setup
    // repartitions + their checkpoints are pure overhead: the r10
    // PageRankProbe sweep (interleaved same-JVM legs at the bench shape)
    // measured copartition = false consistently faster at sf0.1 (5.93 vs
    // 6.76 s median, every rep), superseding the r6 "equal ±1 s" note.
    // The default stays TRUE — the scale regime this parameter exists for
    // is exactly the one where it saves a full edge re-shuffle per round —
    // and small-graph callers (q84) pass false with the measurement cited.
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e = (if (copartition) e0.repartition(parts, col("src")) else e0)
      .localCheckpoint()
    // nodes + out-degrees in ONE shuffle: explode each edge into its two
    // endpoints with a source marker and sum the markers per node — the
    // former distinct ∪ degree-agg ∪ left-join formulation paid three
    // shuffles and a join for the same frame (measured ~1 s of setup at
    // sf0.1; at scale it is two full edge shuffles saved)
    val nd0 = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("d")),
        struct(col("dst").as("node"), lit(0L).as("d")))).as("x"))
      .groupBy(col("x.node").as("node"))
      .agg(sum(col("x.d")).as("deg"))
    val nodesDeg = (if (copartition) nd0.repartition(parts, col("node")) else nd0)
      .localCheckpoint()
    val n = nodesDeg.count()
    require(n > 0, "pageRank needs a non-empty graph")
    // n is MEASURED before the loop, so the broadcast decision is
    // scale-true: a rank frame of ≤ `broadcastRanksMaxNodes` rows (24 B
    // packed each — ≤ ~48 MB at the 2M default) gets an explicit
    // BROADCAST hint on the join's rank side, pinning the plan AQE would
    // discover per round anyway without waiting on per-stage runtime
    // stats; past the bound the hint is withheld and the co-partitioned
    // exchange path serves (a billion-node graph must never collect its
    // rank frame to the driver).
    val hintBroadcastRanks = n <= broadcastRanksMaxNodes
    // With the broadcast hint pinned AND a small shuffle-partition count,
    // AQE has nothing left to do per round — the join is pre-decided and
    // there are no partitions worth coalescing — so its per-stage re-plan
    // loop is pure driver overhead on exactly the floor the r10 jstack
    // profile attributed (driver re-planning + janino, not tasks). The
    // r11 PageRankProbe sweeps (interleaved same-JVM legs, 5 reps)
    // measured BOTH gate sides: at the bench shape (sp=4) AQE off wins
    // 4.51 vs 5.46 s (ckpt2) / 4.32 vs ~4.9 (ckpt1), while at sp=32 AQE
    // ON wins 4.67 vs 4.89 / 4.86 vs 5.22 — there its aggregate-exchange
    // coalescing pays for the re-planning. So the loop's materializations
    // run with AQE DISABLED only when the plan is pinned and the session
    // parallelism is at or under [[AqeOffMaxLoopPartitions]], scoped to
    // this call and RESTORED after (the returned frame and the caller's
    // session see the original setting; GraphSpec pins both — and the
    // loop's `i == iterations` checkpoint clause guarantees EVERY round
    // materializes inside the scope at any checkpointEvery, so no round's
    // plan escapes to post-restore execution; the conf is session-global
    // while the loop runs, the documented price of the scope). Past either
    // gate AQE keeps its duties (skew splits, coalescing) — never touched.
    val aqeKey = "spark.sql.adaptive.enabled"
    val sess = edges.sparkSession
    val scopeAqeOff = hintBroadcastRanks && !adaptiveWhilePinned &&
      parts <= AqeOffMaxLoopPartitions &&
      checkpoint && eagerCheckpoint
    // The scope mutates a SESSION-GLOBAL conf: concurrent queries on the
    // same session lose AQE while the loop runs (documented, accepted for
    // the single-driver bench context this gate targets), and WITHOUT
    // serialization two concurrent pageRank calls could interleave their
    // save/restore and leave AQE off permanently (r11 advice). The lock
    // closes the race half; it serializes only scoped (small-graph)
    // calls — past the gate nothing is touched and nothing locks.
    def runLoop(): DataFrame = {
    val init = Unit / n
    val base = ((100L - dampingPct) * init) / 100L
    var ranks = nodesDeg.withColumn("rank", lit(init))
    for (i <- 1 to iterations) {
      // ONE join + ONE aggregate per round: the per-edge contributions
      // union a zero row per node carrying that node's degree, and a
      // single groupBy(node) yields (Σ contrib, deg) together — folding
      // the former "left-join contrib back onto nodesDeg" stage into the
      // aggregate that already shuffles on node (one fewer join per
      // round; same floor-DIV arithmetic, so the oracle is unchanged)
      val rankSide = {
        val live = ranks.filter(col("deg") > 0)
        if (hintBroadcastRanks) live.hint("BROADCAST") else live
      }
      val edgeContrib = rankSide
        .join(e, rankSide("node") === e("src"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"),
          lit(null).cast("long").as("d"))
      val zeroRows = nodesDeg.select(col("node"), lit(0L).as("c"),
        col("deg").as("d"))
      ranks = edgeContrib.unionByName(zeroRows)
        .groupBy("node")
        .agg(sum("c").as("contrib"), max("d").as("deg"))
        .select(col("node"), col("deg"),
          expr(s"${base}L + (${dampingPct}L * contrib) div 100").as("rank"))
      // truncate lineage every few rounds — each eager localCheckpoint is
      // a full materialization job, so per-round checkpointing pays ~1
      // job of fixed overhead per iteration while a 5-round linear plan
      // is still cheap to optimize. r6 sweep at sf0.1 / 10 rounds (2 runs
      // × 8 variants, one warm JVM): every-5 eager was the consistent
      // best (5.8–6.9 s); every-1, every-3, every-10, and lazy
      // checkpoints all landed 6.6–7.8 s; disabling AQE tripled the time
      // (no broadcast conversion → 32-partition SMJ per round). The
      // union+agg round shape above cut ~1 s vs the former join-back
      // formulation. `checkpoint = false` keeps the whole lineage for
      // plan-audit specs.
      // r7 DECISION — floor accepted: the verdict's remaining idea
      // ("compose two iterations per materialization") is already
      // subsumed by every-5 checkpointing, which composes FIVE rounds
      // per materialization and measured fastest; the 5.8–6.9 s warm
      // band is therefore fixed per-job scheduler overhead at sf0.1
      // scale (≥20 jobs: 2 setup + 10 round-pairs + checkpoints), which
      // shrinks in RELATIVE terms as data grows — the per-round plan
      // (one co-partitioned join + one aggregate) is already minimal.
      // r10 REVISION: the floor moved. With the n-gated broadcast hint
      // landed (jstack showed the warm reps spending time in janino
      // re-compiles and driver-side re-planning of the growing 5-round
      // lineage, not in tasks), SHORTER cadences win in the broadcast
      // regime: PageRankProbe measured nocopart+ckpt2 at 5.03 s and
      // ckpt1 at 4.90 vs 6.03 default (interleaved medians, 5 reps) —
      // short lineage keeps each re-plan/codegen unit small. The default
      // stays 5 (at scale each eager checkpoint is a full rank-frame
      // materialization, and the broadcast-regime numbers don't transfer
      // past the gate); q84 passes checkpointEvery = 2 with the citation.
      if (checkpoint && (i % checkpointEvery == 0 || i == iterations))
        ranks = ranks.localCheckpoint(eagerCheckpoint)
    }
    ranks.select("node", "rank").orderBy("node")
    }
    if (!scopeAqeOff) runLoop()
    else AqeScopeLock.synchronized {
      val aqeBefore = sess.conf.get(aqeKey)
      sess.conf.set(aqeKey, "false")
      try runLoop() finally sess.conf.set(aqeKey, aqeBefore)
    }
  }

  /** Serializes the AQE-off scope of concurrent [[pageRank]] calls (the
    * conf is session-global; see the scope note there). */
  private object AqeScopeLock

  /** The DuckDB twin: same fixed-point update, iterations unrolled as
    * chained CTEs (recursive CTEs restrict aggregation over the recursive
    * relation; unrolling sidesteps engine-specific recursion rules while
    * keeping every arithmetic step identical). `edgesSql` must yield
    * (src BIGINT, dst BIGINT). */
  def pageRankOracleSql(edgesSql: String, iterations: Int = 10,
                        dampingPct: Int = 85): String = {
    val d = dampingPct.toLong
    val head =
      s"""WITH e AS ($edgesSql),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |nd AS (SELECT n.node, coalesce(d.deg, 0) AS deg
         |       FROM nodes n LEFT JOIN deg d USING (node)),
         |consts AS (SELECT ${Unit} // count(*) AS init,
         |                  ((100 - $d) * (${Unit} // count(*))) // 100 AS base
         |           FROM nd),
         |r0 AS (SELECT node, deg, (SELECT init FROM consts) AS rank FROM nd)
         |""".stripMargin
    val iters = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nd.node, nd.deg,
         |         (SELECT base FROM consts)
         |           + ($d * coalesce(c.contrib, 0)) // 100 AS rank
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(p.rank // p.deg) AS BIGINT) AS contrib
         |    FROM $prev p JOIN e ON p.node = e.src
         |    WHERE p.deg > 0 GROUP BY e.dst) c USING (node))""".stripMargin
    }.mkString(",\n")
    head + "," + iters +
      s"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations ORDER BY node"
  }
}
