package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused redaction kernel must be BIT-IDENTICAL to the legacy
  * per-pattern Column chain (regexp_replace fold + per-pattern count sum)
  * — that chain is the reference-semantics twin and the q34 oracle's
  * Spark side. Gating (digit windows, required literals) must never
  * change the match set; the classification itself is pinned so a regex
  * edit that silently degrades a gate to full-scan (or worse, wrongly
  * upgrades one) is caught. */
class RedactKernelSpec extends SparkSpec {
  import spark.implicits._

  private val pats = graft.pipeline.DefaultSits.all
    .filter(_.regex.nonEmpty).map(s => s.id -> s.regex)

  test("gate classification of the SIT dimension is exactly as audited") {
    val gates = pats.map { case (id, re) =>
      id -> RedactKernel.gateName(re)
    }.toMap
    val expectWindow = Set("SIT_CCN", "SIT_ITIN", "SIT_ABA", "SIT_DEA",
      "SIT_EU_DEBIT", "SIT_ICD10", "SIT_ICD9", "SIT_CAN_SIN",
      "SIT_CAN_BANK", "SIT_AUS_TFN", "SIT_CAN_HEALTH", "SIT_AUS_PASSPORT",
      "SIT_AUS_BANK", "SIT_AUS_MEDACC", "SIT_IBAN", "SIT_BR_CPF",
      "SIT_BR_RG", "SIT_UK_NINO", "SIT_FR_INSEE", "SIT_IP")
    val expectLookahead = Set("SIT_CAN_DRIVER", "SIT_AUS_DRIVER",
      "SIT_CAN_PASSPORT")
    expectWindow.foreach { id =>
      assert(gates(id) == "digit-window", s"$id: ${gates(id)}")
    }
    expectLookahead.foreach { id =>
      assert(gates(id) == "digit-gated-lookahead", s"$id: ${gates(id)}")
    }
    assert(gates("SIT_PASSPORT_US_UK") == "literal:passport")
    assert(gates("SIT_DRIVER_US") == "literal:license")
    assert(gates("SIT_BANK_US") == "literal:acc")
    assert(gates("SIT_AZURE_SAS") == "literal:sig=")
    // unprovable ones must fall back to the full scan, never mis-gate
    assert(gates("SIT_SSN") == "full")
    assert(gates("SIT_CAN_PHIN") == "full")
    assert(gates("SIT_SWIFT") == "full")
  }

  test("RegexFacts: digit requirement, length bounds, and literals on " +
    "hand cases") {
    def facts(re: String) = RegexFacts.analyze(re).get
    val ssnish = facts("\\b\\d{3}-\\d{2}-\\d{4}\\b")
    assert(ssnish.requiresDigit && ssnish.maxLen == 11)
    // digits inside a lookahead are NOT in-match digits
    val look = facts("\\b(?=.*\\d)[A-Z]{4}\\b")
    assert(!look.requiresDigit)
    // unbounded mandatory part → Unbounded
    assert(facts("abc[:\\s]*\\d{3}").maxLen == RegexFacts.Unbounded)
    assert(facts("abc[:\\s]*\\d{3}").requiresDigit)
    assert(facts("abc[:\\s]*\\d{3}").literals == Seq("abc"))
    // alternation: digit required only if EVERY branch requires it
    assert(!facts("\\d{3}|[A-Z]{3}").requiresDigit)
    assert(facts("\\d{3}|x\\dy").requiresDigit)
    // common literal across branches (substring containment)
    assert(facts("account\\d+|(?<=acct[:\\s])\\d+").literals == Seq("acc"))
    // optional groups contribute neither digits nor literals
    assert(!facts("(\\d)?[A-Z]{2}").requiresDigit)
    assert(facts("(?:foo)?bar").literals == Seq("bar"))
    // unsupported constructs refuse to answer rather than guess
    assert(RegexFacts.analyze("\\p{L}+").isEmpty)
    assert(RegexFacts.analyze("(?<name>\\d+)").isEmpty)
  }

  test("RegexFacts soundness holes from the round-8 audit are closed") {
    def facts(re: String) = RegexFacts.analyze(re).get
    // a negated class never proves a digit requirement: [^0-9] has only
    // digit MEMBERS but matches only NON-digits
    assert(!facts("X[^0-9]{2}").requiresDigit)
    assert(!facts("X[^\\d]{2}").requiresDigit)
    assert(RedactKernel.gateName("X[^0-9]{2}") == "literal:x")
    // ...and the gated scan still finds digit-free matches
    val df = Seq("see Xab here").toDF("text")
    val n = df.select(RedactExprs.countAllCol(col("text"),
      Seq("T" -> "X[^0-9]{2}")).as("n")).head.getLong(0)
    assert(n == 1L)
    // class intersection / nested classes mis-parse → must refuse
    assert(RegexFacts.analyze("[a-z&&[b]]").isEmpty)
    assert(RegexFacts.analyze("[[ab]c]").isEmpty)
    // COMMENTS mode changes how the remainder parses → must refuse;
    // known fact-neutral flags (incl. negation) still parse
    assert(RegexFacts.analyze("(?x)abc def").isEmpty)
    assert(RegexFacts.analyze("(?xi:abc)").isEmpty)
    assert(facts("(?i)abc\\d").requiresDigit)
    assert(facts("(?i-m:abc)\\d{2}").literals == Seq("abc"))
    // non-ASCII literal can never pass the ASCII-fold containsCi → the
    // pattern must take the full scan, not a dead literal gate
    assert(RedactKernel.gateName("MÉTRO[a-z]+") == "full")
    val dfU = Seq("le MÉTROx stop").toDF("text")
    val nU = dfU.select(RedactExprs.countAllCol(col("text"),
      Seq("T" -> "MÉTRO[a-z]+")).as("n")).head.getLong(0)
    assert(nU == 1L)
  }

  // the legacy chain — reference semantics for the equality pin
  private def legacy(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("n_legacy",
      graft.ops.Curation.redactionCountCol(col("text"), pats))
    .withColumn("r_legacy", graft.ops.Curation.redactCol(col("text"), pats))

  private def fused(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("n_fused", RedactExprs.countAllCol(col("text"), pats))
    .withColumn("r_fused", RedactExprs.redactAllCol(col("text"), pats))

  private def assertEqualOn(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = fused(legacy(df))
      .filter(col("n_legacy") =!= col("n_fused") ||
        not(col("r_legacy") <=> col("r_fused")))
      .select("text", "n_legacy", "n_fused", "r_legacy", "r_fused")
      .take(3)
    assert(bad.isEmpty, bad.map(r =>
      s"text=${r.getString(0).take(120)}… legacy n=${r.getLong(1)} " +
        s"fused n=${r.getLong(2)}\n legacy r=${r.getString(3).take(200)}\n" +
        s" fused r=${r.getString(4).take(200)}").mkString("\n---\n"))
  }

  test("fused kernel equals the legacy chain on the real corpus") {
    assertEqualOn(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text"))
  }

  test("fused kernel equals the legacy chain on adversarial boundary docs") {
    val letters = "alpha bravo charlie delta echo foxtrot golf hotel " * 4
    val adversarial = Seq(
      // matches at document start / end, digits at position 0
      "123-45-6789",
      "9" + "a" * 100 + " 912-34-5678",
      "text ending in an SSN 123-45-6789",
      // digit exactly WindowRadius chars from a potential match start
      letters.take(48) + "AB123456C" + letters.take(48),
      // two matches whose windows merge, and adjacent matches that the
      // resume-at-end semantics must not double-count
      "4111-1111-1111-1111 4111111111111111 and ip 10.0.0.1 10.0.0.2",
      // keyword gates, case variants, keyword spanning a newline
      "PASSPORT: AB1234567 done",
      "passport\nnumber: X9876543",
      "account\n  12345678 and acct 87654321",
      "Driver's License: D123-4567",
      "sig=abcDEF123456789012 but SIG=NOTLOWER9999999999",
      // digit-gated lookahead family: digit later on the line only
      "CODE ABCD4 and WXYZ with 7 after",
      "ssn:   123-45-6789 with keyword gap",
      // no digits at all (every digit-window pattern must skip cleanly)
      letters,
      // unicode, supplementary chars, empty-ish docs
      "café 𝐛 12.345.678-9 résumé",
      "", " ", "\n\n\n",
      // IBAN / SWIFT / ICD shapes near window edges
      "x" * 47 + "1 GB82WEST12345698765432 " + "y" * 47,
      "DEUTDEFF and DEUTDEFF500 swift codes, icd A12.34 and 123.45"
    ).toDF("text")
    assertEqualOn(adversarial)
    // null text: both kernels must pass null through
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
    val out = fused(nulls).select("n_fused", "r_fused").collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("fused kernel equals the legacy chain on generated SIT-laden docs") {
    // the pipeline's own generator output is the densest realistic input:
    // every doc carries several true SIT values plus near-miss fillers
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").limit(2000)
    assertEqualOn(docs)
  }
}
