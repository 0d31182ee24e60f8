package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native regex_matches ≡ the UDF form, inside codegen. */
class RegexMatchesExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression agrees with the UDF on corpus-like data") {
    val df = Seq(
      ("pay 5133 2181 9600 1338 now", "\\b\\d{4}( \\d{4}){3}\\b"),
      ("Ssn: 1\nssn: 2", "^ssn: (\\d+)$"),
      ("no hits here", "\\d{9}"),
      (null.asInstanceOf[String], "x"))
      .toDF("text", "pattern")
    val both = df.select(
      RegexMatches.regexMatches(col("text"), col("pattern")).as("viaUdf"),
      RegexMatchesExpr.regexMatchesNative(col("text"), col("pattern")).as("viaExpr"))
    both.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) ||
        (r.isNullAt(1) && r.getSeq[Any](0).isEmpty)) // UDF returns [] for null, expr null
      if (!r.isNullAt(0) && !r.isNullAt(1))
        assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
    // position/excerpt semantics preserved end to end
    val one = df.limit(1).select(
      RegexMatchesExpr.regexMatchesNative(col("text"), col("pattern")).as("m"))
      .selectExpr("inline(m)").collect()
    assert(one(0).getString(0) == "5133 2181 9600 1338")
    assert(one(0).getInt(1) == 4)
  }

  test("stays inside whole-stage codegen") {
    val df = Seq(("a 123-45-6789 b", "\\d{3}-\\d{2}-\\d{4}")).toDF("t", "p")
      .select(size(RegexMatchesExpr.regexMatchesNative(col("t"), col("p"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(df.collect()(0).getInt(0) == 1)
  }
}
