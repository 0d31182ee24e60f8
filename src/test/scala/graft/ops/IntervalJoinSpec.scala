package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval join: boundary semantics, bucket-crossing matches, zero-match
  * rows, and key isolation — against hand-computed expectations. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // window: [pt-100, pt)

  test("countPreceding: boundaries, bucket crossing, zero matches, key isolation") {
    // purchases (id, user, ts); window [ts-100, ts)
    val left = Seq(
      (1L, "u1", 1000L), // clicks at 900 (incl), 950, 999 → 3; 1000 excl
      (2L, "u1", 150L),  // click at 51 (incl, crosses bucket 0→1), 49 excl
      (3L, "u2", 500L),  // no clicks for u2 → 0
      (4L, "u3", 200L)   // u1's clicks must not leak → 0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", 900L), ("u1", 950L), ("u1", 999L), ("u1", 1000L),
      ("u1", 51L), ("u1", 49L),
      ("u1", 150L) // exactly at purchase 2's ts → excluded
    ).toDF("user_id", "ts")
    val out = IntervalJoin.countPreceding(left, right, "user_id", "ts", "ts",
        window = W, countAlias = "n_clicks")
      .select("event_id", "n_clicks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("countPreceding agrees with a naive nested-loop join on random data") {
    val rnd = new scala.util.Random(7)
    val ls = (1L to 200L).map(i => (i, s"u${rnd.nextInt(5)}", rnd.nextInt(2000).toLong))
    val rs = (1 to 800).map(_ => (s"u${rnd.nextInt(5)}", rnd.nextInt(2000).toLong))
    val expected = ls.map { case (id, u, ts) =>
      id -> rs.count { case (ru, rts) => ru == u && rts >= ts - W && rts < ts }.toLong
    }.toMap
    val got = IntervalJoin.countPreceding(
        ls.toDF("event_id", "user_id", "ts"), rs.toDF("user_id", "ts"),
        "user_id", "ts", "ts", window = W, countAlias = "n")
      .select("event_id", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
