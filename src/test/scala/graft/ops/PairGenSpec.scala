package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compiled in-bucket pair kernels vs their interpreted
  * nested-transform twins (the r10 jstack finding: higher-order
  * functions have no codegen, so the former HOF pair generators paid a
  * slice copy per outer element and an InternalRow per pair in
  * ArrayTransform.eval). Identity must be ELEMENT-exact so the swap can
  * never change q18/q19/q39/q89/q96 or the simhash candidates. */
class PairGenSpec extends SparkSpec {
  import spark.implicits._

  test("sorted-pairs kernel == HOF twin over the sorted array (property: " +
    "sizes 0..40, duplicates included)") {
    val rng = new scala.util.Random(13)
    val arrays = Seq(Seq.empty[Long], Seq(7L), Seq(3L, 3L)) ++
      Seq.tabulate(60) { _ =>
        Seq.fill(rng.nextInt(41))(rng.nextLong() % 50)
      }
    val df = arrays.toDF("ids")
    // private kernel: exercised through minhashPairs' public surface is
    // indirect — compare the Column forms directly via the HOF twin on a
    // sorted input (the kernel sorts internally)
    val viaKernel = Dedup.minhashPairsKernelForSpec(col("ids"))
    val viaHof = Dedup.pairsHofCol(array_sort(col("ids")))
    val rows = df.select(viaKernel.as("k"), viaHof.as("h")).collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1)))
      val h = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1)))
      assert(k === h)
    }
  }

  test("packed pair kernel, unpacked == struct kernel (property: the r16 " +
    "serving twin — pack/unpack must be bijective on the guarded range)") {
    val rng = new scala.util.Random(29)
    val arrays = Seq(Seq.empty[Long], Seq(7L), Seq(3L, 3L),
      Seq(0L, (1L << 31) - 1)) ++ // range endpoints
      Seq.tabulate(60) { _ =>
        // & Long.MaxValue, not math.abs: abs(Long.MinValue) is NEGATIVE
        // (r16 advice) — a seed change could trip the pack range guard
        Seq.fill(rng.nextInt(41))((rng.nextLong() & Long.MaxValue) % ((1L << 31) - 1))
      }
    val df = arrays.toDF("ids")
    val rows = df.select(
        Dedup.minhashPairsKernelForSpec(col("ids")).as("k"),
        transform(Dedup.packedPairsKernelForSpec(col("ids")), { x =>
          val (ua, ub) = Dedup.unpackPairColsForSpec(x)
          struct(ua.as("_1"), ub.as("_2"))
        }).as("p"))
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1)))
      val p = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1)))
      assert(k === p)
    }
  }

  test("packed pair kernel range guard is LOUD: an id past 2^31 raises " +
    "with the value, never silently corrupts a pair") {
    val df = Seq(Seq(1L, 1L << 31)).toDF("ids")
    val e = intercept[Exception] {
      df.select(Dedup.packedPairsKernelForSpec(col("ids"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pair packing needs")),
      s"guard message missing in: ${messages(e).mkString(" | ")}")
  }

  test("simhash-pairs kernel == HOF twin (property, incl. hamming)") {
    val rng = new scala.util.Random(17)
    val arrays = Seq(Seq.empty[(Long, Long)], Seq((1L, 255L))) ++
      Seq.tabulate(40) { _ =>
        Seq.fill(rng.nextInt(25))((rng.nextLong() % 30, rng.nextLong()))
      }
    val df = arrays.toDF("members")
    val rows = df.select(
      Dedup.simhashPairsKernelForSpec(col("members")).as("k"),
      Dedup.simhashPairsHofCol(col("members")).as("h")).collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      val h = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      assert(k === h)
    }
  }
}
