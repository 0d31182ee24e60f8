package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric star — hub outranks leaves, leaves tie") {
    // star: 0 — {1,2,3,4}, symmetrized
    val edges = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
      .toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet === Set(0L, 1L, 2L, 3L, 4L))
    val leaves = (1L to 4L).map(ranks)
    assert(leaves.distinct.size === 1, "leaves must tie exactly")
    assert(ranks(0L) > leaves.head * 2,
      s"hub ${ranks(0L)} should clearly outrank a leaf ${leaves.head}")
  }

  test("pageRank: regular graph is the uniform fixed point (exact)") {
    // 4-cycle, symmetrized: every node deg 2 — rank stays at init
    // forever because contrib(v) = 2 * (init DIV 2) = init, so
    // rank' = 15%·init + 85%·init = init (modulo exact floor arithmetic)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 5)
      .as[(Long, Long)].collect().toMap
    val init = Graph.Unit / 4
    assert(ranks.values.toSet === Set(init))
  }

  test("pageRank: mass is conserved up to deterministic floor leak") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L),
      (0L, 3L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 10)
      .as[(Long, Long)].collect()
    val total = ranks.map(_._2).sum
    // each round each node can leak < deg units to DIV plus < 1 to the
    // two /100 steps; 10 rounds x 4 nodes x small degs ≪ 1000 units
    assert(total <= Graph.Unit && total > Graph.Unit - 1000,
      s"total mass $total drifted")
  }

  test("pageRank plan: iteration is join + hash aggregate, no window, " +
    "no cartesian") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val plan = Graph.pageRank(edges, iterations = 1, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
    assert(plan.contains("HashAggregate"),
      s"contrib rollup should be a hash aggregate:\n$plan")
  }

  test("pageRank: n-gated broadcast hint — in-gate graphs pin the " +
    "broadcast join up front, past-the-gate graphs withhold it, ranks " +
    "identical") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    def initialPlan(bcastMax: Long): String =
      Graph.pageRank(edges, iterations = 1, checkpoint = false,
          broadcastRanksMaxNodes = bcastMax)
        .queryExecution.executedPlan.toString
    // 3 nodes ≤ any positive gate → the INITIAL plan (pre-AQE) already
    // carries the broadcast join with the RANK side as the build
    // (BuildLeft — rankSide is the join's left). The negative side can't
    // assert "no broadcast" on spec-sized frames: the planner
    // auto-broadcasts ANY side under autoBroadcastJoinThreshold — but
    // unhinted it picks by size estimate (the edges LocalRelation,
    // BuildRight here), so the build side is the observable hint effect.
    val hintedPlan = initialPlan(2000000L)
    assert(hintedPlan.contains("BroadcastHashJoin") &&
      hintedPlan.contains("BuildLeft"), s"rank side not pinned:\n$hintedPlan")
    // scope the negative gate to the rank-side join NODE (the hash-join
    // line keyed on src), not the whole plan string — an unrelated future
    // BuildLeft join elsewhere in the plan must not flip this (r11 ADVICE)
    val unhintedJoins = initialPlan(0L).linesIterator
      .filter(l => l.contains("HashJoin") && l.contains("src")).toSeq
    assert(unhintedJoins.nonEmpty &&
      unhintedJoins.forall(!_.contains("BuildLeft")),
      s"past-the-gate rank join should not build left:\n$unhintedJoins")
    val hinted = Graph.pageRank(edges, iterations = 5)
      .as[(Long, Long)].collect().toSeq.sorted
    val unhinted = Graph.pageRank(edges, iterations = 5,
        broadcastRanksMaxNodes = 0L)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(hinted === unhinted)
  }

  test("pageRank: dstPartitionLoop — ranks identical to the default " +
    "shape, and the round body plans no shuffle above its checkpoints") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (0L, 3L),
      (1L, 3L)).toDF("src", "dst")
    val default = Graph.pageRank(edges, iterations = 6)
      .as[(Long, Long)].collect().toSeq.sorted
    val dstLoop = Graph.pageRank(edges, iterations = 6,
        dstPartitionLoop = true)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(default === dstLoop)
    // one un-checkpointed round (minus the final orderBy, which owns the
    // only legitimate exchange): the contrib aggregate and the reattach
    // join must both ride the setup partitioning — no ShuffleExchange in
    // the round body. checkpoint=false keeps the round's lineage visible;
    // the setup repartitions hide below their own localCheckpoints.
    val plan = Graph.pageRank(edges, iterations = 1, checkpoint = false,
        dstPartitionLoop = true)
      .queryExecution.executedPlan.toString
    val body = plan.linesIterator
      .filterNot(_.contains("rangepartitioning")).mkString("\n")
    assert(!body.contains("Exchange hashpartitioning"),
      s"dstPartitionLoop round body should be exchange-free:\n$plan")
  }

  test("pageRank: AQE-off-while-pinned scope — ranks identical either " +
    "way, session setting restored after the call") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    assert(before === "true", "spec assumes the session default")
    val scoped = Graph.pageRank(edges, iterations = 4)
      .as[(Long, Long)].collect().toSeq.sorted
    // the loop ran with AQE scoped off (in-gate, eager checkpoints) and
    // the session came back untouched
    assert(spark.conf.get(key) === before)
    val unscoped = Graph.pageRank(edges, iterations = 4,
        adaptiveWhilePinned = true)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(scoped === unscoped)
    assert(spark.conf.get(key) === before)
  }
}
