package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bounded-collect aggregators must behave exactly like
  * collect_list + size filter at the output level (that is the contract the
  * pair generators rely on), while never holding more than `max` members of
  * buffer state per group — asserted here at the output level (NULL for
  * oversized groups) and by a direct Aggregator-API drive of the update
  * path (buffer emptied the moment a group overflows). */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("longs: groups at or under the cap collect every member, over-cap " +
    "groups finish NULL — same keep/drop set as collect_list + size filter") {
    val df = Seq(
      // key "a": 3 members, "b": exactly 4 (= cap), "c": 5 (> cap), "d": 1
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 11L), ("b", 12L), ("b", 13L),
      ("c", 20L), ("c", 21L), ("c", 22L), ("c", 23L), ("c", 24L),
      ("d", 30L)
    ).toDF("k", "id").repartition(4) // spread groups across partitions so
    // partial buffers really merge
    val bounded = df.groupBy("k")
      .agg(BoundedCollect.longs(4)(col("id")).as("ids"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Long](1)).map(_.toSet)).toMap
    val reference = df.groupBy("k")
      .agg(collect_list(col("id")).as("ids"))
      .collect().map { r =>
        val s = r.getSeq[Long](1).toSet
        r.getString(0) -> (if (s.size <= 4) Some(s) else None)
      }.toMap
    assert(bounded == reference)
    assert(bounded("c").isEmpty, "over-cap group must be NULL")
    assert(bounded("b").contains(Set(10L, 11L, 12L, 13L)),
      "exactly-at-cap group must keep all members")
  }

  test("pairs: two-column members survive as (_1, _2) structs; over-cap " +
    "groups finish NULL") {
    val df = Seq(
      ("x", 1L, 101L), ("x", 2L, 102L),
      ("y", 3L, 103L), ("y", 4L, 104L), ("y", 5L, 105L)
    ).toDF("k", "id", "v")
    val out = df.groupBy("k")
      .agg(BoundedCollect.pairs(2)(col("id"), col("v")).as("ms"))
      .selectExpr("k", "transform(ms, m -> struct(m._1, m._2)) AS ms")
      .as[(String, Option[Seq[(Long, Long)]])]
      .collect().toMap
    assert(out("x").map(_.toSet).contains(Set(1L -> 101L, 2L -> 102L)))
    assert(out("y").isEmpty)
  }

  test("update path drops an overflowed group's buffer eagerly — state " +
    "never exceeds the cap even mid-stream") {
    val agg = new BoundedCollect.Longs(3)
    var buf = agg.zero
    (1L to 100L).foreach { i =>
      buf = agg.reduce(buf, i)
      assert(BoundedCollect.bufN(buf) <= 3, s"buffer grew past cap at item $i")
      assert(buf.length <= 1 + 3, s"buffer capacity grew past cap at item $i")
    }
    assert(BoundedCollect.bufN(buf) == -1L && buf.length == 1,
      "overflowed buffer must be flagged and emptied")
    // merge of an overflowed partial poisons the group the same way
    val merged = agg.merge(agg.reduce(agg.zero, 7L), buf)
    assert(BoundedCollect.bufN(merged) == -1L && merged.length == 1)
    assert(agg.finish(merged) == null)
    // merge of two small partials that jointly exceed the cap also drops
    val a = agg.reduce(agg.reduce(agg.zero, 1L), 2L)
    val b = agg.reduce(agg.reduce(agg.zero, 3L), 4L)
    assert(agg.finish(agg.merge(a, b)) == null)
    // and two that jointly fit, concatenate
    assert(agg.finish(agg.merge(a, agg.reduce(agg.zero, 9L)))
      .toSet == Set(1L, 2L, 9L))
  }

  test("minhash pair generation is unchanged by the bounded collapse, and " +
    "a hot band drops its whole bucket") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // uncapped reference: plain collect_list collapse over the same bands
    val bandDf = Dedup.minhashBands(docs, "doc_id", "text", 3, 4, 2)
    val reference = bandDf.groupBy("band")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
      .select(explode(col("ids")).as("id"), col("ids"))
      .select(col("id").as("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every bounded pair must come from a reference band bucket
    assert(pairs.subsetOf(reference),
      s"bounded collapse invented pairs: ${pairs.diff(reference).take(5)}")
    // drop the cap to 1: every multi-member band overflows → no pairs
    val capped = Dedup.minhashNearDups(docs, "doc_id", "text", 0.0,
      maxBucket = 1)
    assert(capped.count() == 0, "cap=1 must drop every pairable bucket")
  }
}
