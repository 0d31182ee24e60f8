package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** P5 — table-driven from FIXTURES.md §5 (which mirrors
  * `modules/validator.py:147-194`), plus pure-Scala ↔ Column cross-check. */
class PlaceholderSpec extends SparkSpec {

  val fixtures: Seq[(String, Boolean)] = Seq(
    "0000 0000 0000 0000" -> true,  // all-zero digits
    "XXX-XX-XXXX" -> true,          // blocklist "xxx"
    "sig=XXXXX" -> true,            // sig rule
    "REDACTED_SIT_CCN" -> true,     // blocklist "redacted"
    "ab" -> true,                   // <=2 chars
    "abc123" -> true,               // short slug
    "--- ---" -> true,              // >60% non-alnum
    "ZZ0000000" -> true,            // digits all-zero
    "XXXXXXX" -> true,              // mask run
    "aaaaaa" -> true,               // single repeated char
    "ilIoO0" -> true,               // OCR-ambiguous run
    "5133 2181 9600 1338" -> false, // valid Luhn CCN
    "GB975881537147321046" -> false, // valid IBAN
    "841-269-960" -> false,         // valid CAN SIN
    "KT380931C" -> false,           // NINO-shaped
    "192.168.43.17" -> false,       // IP (dots are non-alnum but ratio < .6)
    "472-51-2711" -> false)         // SSN-shaped

  test("pure function matches the fixture table") {
    fixtures.foreach { case (v, expected) =>
      assert(Placeholder.isPlaceholder(v) == expected, s"'$v'")
    }
    assert(Placeholder.isPlaceholder(null))
    assert(Placeholder.isPlaceholder("   "))
  }

  test("Column expression agrees with the pure function on a value corpus") {
    import spark.implicits._
    // fixtures + generated TP/FP values for every SIT + adversarial edges
    val sits = graft.pipeline.DefaultSits.all
    val generated = for {
      s <- sits; key <- 1L to 20L; label <- Seq("TP", "FP")
    } yield graft.pipeline.SitValues.value(s.id, s.name, label, key, 0)
    val edges = Seq("", " ", "a", "0", "x", "....", "a b", "0a0a0a0a",
      "sig=realSIGvalue123", "N/A", "IIIIII", "-1-2-3-4-5-6-7-8-9")
    val values = (fixtures.map(_._1) ++ generated ++ edges).distinct
    val df = values.toDF("v")
      .withColumn("col_result", Placeholder.isPlaceholderCol(col("v")))
    val results = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    values.foreach { v =>
      assert(results(v) == Placeholder.isPlaceholder(v),
        s"pure vs Column disagree on '$v'")
    }
  }
}
