package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessions + Skew operator semantics on hand-made inputs. */
class SessionsSkewSpec extends SparkSpec {
  import spark.implicits._

  private val G = 1000000000L // 1s in nanos

  test("sessionize: gap splits, per-user independence, tie determinism") {
    val ev = Seq(
      (1L, 10L, 0L * G), (1L, 11L, 60L * G), (1L, 12L, 5000L * G), // u1: 2 sessions
      (2L, 20L, 0L * G), (2L, 21L, 0L * G),                        // u2: tie ts
      (2L, 22L, 10000L * G)).toDF("user_id", "event_id", "ts")
    val out = Sessions.sessionStats(ev, "user_id", "event_id", "ts",
      gapNanos = 30L * 60 * G).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 1L)) == 2) // first session: events at 0s and 60s
    assert(out((1L, 2L)) == 1)
    assert(out((2L, 1L)) == 2) // tied timestamps stay in one session
    assert(out((2L, 2L)) == 1)
  }

  test("salted aggregation equals the plain groupBy") {
    val df = (1L to 5000L).map(i => (s"k${i % 3}", i, i.toDouble))
      .toDF("key", "id", "v")
    val salted = Skew.saltedAgg(df, "key", col("id"), col("v"), salts = 8)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.map(t => (t._1, t._2)).toSeq == plain.map(t => (t._1, t._2)).toSeq)
    salted.zip(plain).foreach { case (a, b) =>
      assert(math.abs(a._3 - b._3) < 1e-6)
    }
    // the partial phase really fans out: |keys| x salts groups
    val partialGroups = df
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      .groupBy("key", "_salt").count().count()
    assert(partialGroups > 3 && partialGroups <= 24)
  }

  test("salted join equals the plain join on a 90%-hot key") {
    val fact = (1L to 20000L).map(i =>
      (if (i % 10 != 0) "hot" else s"k${i % 7}", i)).toDF("key", "id")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B"), ("k6", "C"))
      .toDF("key", "label")
    val salted = Skew.saltedJoin(fact, dim, "key", col("id"), salts = 8)
    val plain = fact.join(dim, "key")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the join key really fans out: hot rows spread over the salt range
    val spread = fact.withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("key") === "hot").select("_salt").distinct().count()
    assert(spread == 8)
  }

  test("funnel: stage order is enforced, not just event presence") {
    val ev = Seq(
      // user 1: clean view→click→purchase
      (1L, 10L, "view", 100L), (1L, 11L, "click", 200L),
      (1L, 12L, "purchase", 300L),
      // user 2: click BEFORE any view — click/purchase must not qualify
      (2L, 20L, "click", 100L), (2L, 21L, "view", 200L),
      (2L, 22L, "purchase", 300L), // purchase needs a qualified click first
      // user 3: view→click, purchase precedes the click — only 2 stages
      (3L, 30L, "purchase", 50L), (3L, 31L, "view", 100L),
      (3L, 32L, "click", 200L),
      // user 4: same-ts view+click — order column (event id) breaks the
      // tie, view first, so the click at the same instant qualifies
      (4L, 40L, "view", 100L), (4L, 41L, "click", 100L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Sessions.funnelUserTimes(ev, "user_id", "event_type", "ts",
        "event_id", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(got(2L) == ((Some(200L), None, None)))
    assert(got(3L) == ((Some(100L), Some(200L), None)))
    assert(got(4L) == ((Some(100L), Some(100L), None)))
  }
}
