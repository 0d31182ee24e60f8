package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // 1s in nanos

  // (event_id, user_id, ts, event_type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")

  private def run(df: org.apache.spark.sql.DataFrame, lookback: Long = 100 * S) =
    Attribution.byChannel(df, "event_id", "user_id", "ts", "event_type",
      "value", "purchase", Seq("click", "view"), lookback)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand-computed credits: first/last/linear across two channels") {
    // user 1: click@10, view@20, click@30, purchase@40 ($3.00 = 300c)
    //   k=3; first=click(10), last=click(30); linear 300*10000/3=1_000_000
    val out = run(ev(
      (1, 1, 10 * S, "click", 0), (2, 1, 20 * S, "view", 0),
      (3, 1, 30 * S, "click", 0), (4, 1, 40 * S, "purchase", 3.00)))
    assert(out("click") === ((2L, 300L, 300L, 2000000L)))
    assert(out("view") === ((1L, 0L, 0L, 1000000L)))
  }

  test("lookback excludes stale touches; strict < excludes same-instant") {
    val out = run(ev(
      (1, 1, 10 * S, "click", 0), // stale: 90s before purchase, window 50s
      (2, 1, 80 * S, "view", 0),
      (3, 1, 100 * S, "click", 0), // same instant as purchase: excluded
      (4, 1, 100 * S, "purchase", 1.00)), lookback = 50 * S)
    assert(out === Map("view" -> ((1L, 100L, 100L, 1000000L))))
  }

  test("users don't cross; conversions without touches earn nothing") {
    val out = run(ev(
      (1, 1, 10 * S, "click", 0), (2, 2, 20 * S, "purchase", 5.00),
      (3, 3, 30 * S, "purchase", 7.00)))
    assert(out.isEmpty)
  }

  test("timestamp ties break by event id (deterministic first/last)") {
    val out = run(ev(
      (6, 1, 10 * S, "click", 0), (2, 1, 10 * S, "view", 0),
      (9, 1, 40 * S, "purchase", 1.00)))
    // same ts: view(id 2) is first, click(id 6) is last
    assert(out("view") === ((1L, 100L, 0L, 500000L)))
    assert(out("click") === ((1L, 0L, 100L, 500000L)))
  }

  test("floor-division remainder is deterministic, never negative credit") {
    // $0.01 across 3 touches: 10000/3 = 3333 micro-cents each
    val out = run(ev(
      (1, 1, 10 * S, "click", 0), (2, 1, 20 * S, "click", 0),
      (3, 1, 30 * S, "click", 0), (4, 1, 40 * S, "purchase", 0.01)))
    assert(out("click")._4 === 3 * 3333L)
  }

  test("plan: one user-key join feeds all three credit windows " +
    "(single window exchange on conv_id)") {
    val df = ev((1, 1, 10 * S, "click", 0), (2, 1, 40 * S, "purchase", 1.0))
    val plan = Attribution.byChannel(df, "event_id", "user_id", "ts",
      "event_type", "value", "purchase", Seq("click", "view"), 100 * S)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"interval predicate must ride the hash equi-join:\n$plan")
    val convExchanges = "hashpartitioning\\(conv_id".r
      .findAllIn(plan).size
    assert(convExchanges <= 1,
      s"the three credit windows should share one conv_id exchange:\n$plan")
  }
}
