package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Schema-drift pins for every testdata table the oracle queries read —
  * the family EventTimeSpec started for `events.ts`, extended so the NEXT
  * testdata regeneration degrades loudly EVERYWHERE: if a column the
  * correctness gates depend on changes type or disappears, these fail
  * with the exact fix list instead of 91 queries quietly hash-diverging. */
class TableDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def tbl(name: String) = spark.read.parquet(s"$dir/$name.parquet")

  test("documents carries the pinned dedup/text-analysis columns") {
    SchemaContract.requirePinned(tbl("documents"), "documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("orders / lineitem carry the pinned TPC-H columns") {
    SchemaContract.requirePinned(tbl("orders"), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType)
    SchemaContract.requirePinned(tbl("lineitem"), "lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType)
  }

  test("embeddings carries vec_id + float-array embedding") {
    SchemaContract.requirePinned(tbl("embeddings"), "embeddings",
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true))
  }

  test("events carries the pinned non-ts columns (ts is EventTimeSpec's)") {
    SchemaContract.requirePinned(tbl("events"), "events",
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType)
  }

  test("dimension tables carry the pinned star-join columns") {
    SchemaContract.requirePinned(tbl("region"), "region",
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    SchemaContract.requirePinned(tbl("nation"), "nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    SchemaContract.requirePinned(tbl("customer"), "customer",
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    SchemaContract.requirePinned(tbl("supplier"), "supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    SchemaContract.requirePinned(tbl("part"), "part",
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("a mutated fixture fails with the full actionable fix list") {
    val tmp = Files.createTempDirectory("drift").toFile
    tmp.deleteOnExit()
    // doc_id drifts long→string, n_chars disappears — both must be named
    spark.range(3).select(
        concat(lit("d"), col("id")).as("doc_id"),
        lit("some text").as("text"), lit("en").as("lang"),
        lit("web").as("source"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = intercept[IllegalStateException] {
      SchemaContract.requirePinned(
        spark.read.parquet(s"$tmp/documents.parquet"), "documents",
        "doc_id" -> LongType, "text" -> StringType, "n_chars" -> LongType)
    }
    assert(e.getMessage.contains("documents.doc_id drifted to StringType"))
    assert(e.getMessage.contains("documents.n_chars is MISSING"))
    assert(e.getMessage.contains("adapt the reader"))
  }

  test("extra columns are additive evolution, not drift") {
    val df = tbl("documents").withColumn("extra", lit(1))
    SchemaContract.requirePinned(df, "documents",
      "doc_id" -> LongType, "text" -> StringType)
  }
}
