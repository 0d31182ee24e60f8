package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-4 flagship DAG on a hand-made corpus with hand-computed expected
  * counts (SURVEY.md §7.3 minimum slice). */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  // 5-doc mapping: exercises TP-satisfied, TP-missing, FP-flagged, FP-clean,
  // TC-only (regex-less), and unparsable instances.
  private lazy val mapping = Seq(
    // doc 1: CCN TP needs 2, text has 2 real CCNs -> tp_ok
    (1L, "d1.txt", "SIT_CCN", "TP", "2"),
    // doc 2: CCN TP needs 2, text has 1 real -> issue
    (2L, "d2.txt", "SIT_CCN", "TP", "2"),
    // doc 3: ABA FP, text has a real-looking 9-digit number -> fp_flagged
    (3L, "d3.txt", "SIT_ABA", "FP", "1"),
    // doc 4: ABA FP, text has only the placeholder -> clean
    (4L, "d4.txt", "SIT_ABA", "FP", "1"),
    // doc 5: TC-only SIT (no regex) + garbage instances -> defaults to 1, no match
    (5L, "d5.txt", "SIT_FINANCE_TC", "TP", "x"))
    .map { case (id, f, sid, lbl, inst) => (id, f, sid, lbl, inst) }
    .toDF("doc_id", "filename", "sit_ids", "labels", "instances")

  private lazy val corpus = Seq(
    ("d1.txt", "pay 5133 2181 9600 1338 and 4539 1488 0343 6467 thanks"),
    ("d2.txt", "one card 5133 2181 9600 1338 and fake 0000 0000 0000 0000"),
    ("d3.txt", "routing 123456789 ok"),
    ("d4.txt", "routing 000000000 zeroed"),
    ("d5.txt", "no numbers at all")).toDF("filename", "text")

  private lazy val sitDim = PipelineConfig.default.sitDim(spark).toDF()

  private lazy val result = {
    val v = Validator.verdicts(
      Validator.explodeAssignments(mapping), corpus, sitDim)
    (Validator.report(v), Validator.issues(v))
  }

  test("per-SIT report matches hand counts") {
    val rep = result._1.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep("SIT_CCN") == ((2L, 1L, 0L, 4L)))      // 2 docs, 1 tp_ok, sum inst 4
    assert(rep("SIT_ABA") == ((2L, 0L, 1L, 2L)))      // d3 flagged, d4 clean
    assert(rep("SIT_FINANCE_TC") == ((1L, 0L, 0L, 1L))) // "x" -> default 1
  }

  test("issues cover the TP-miss and FP-flag rows, in order") {
    val issues = result._2.collect().map(_.getAs[String]("issue"))
    assert(issues.length == 3) // d2 TP missing, d3 FP flagged, d5 TP missing
    assert(issues(0).startsWith("TP missing matches for doc 2, sit SIT_CCN"))
    assert(issues(1).startsWith("FP contains valid-looking match in doc 3"))
    assert(issues(2).startsWith("TP missing matches for doc 5, sit SIT_FINANCE_TC"))
  }

  test("explodeAssignments: positional zip with defaults") {
    val df = Seq((9L, "f", "A;B;C", "TP", "5"))
      .toDF("doc_id", "filename", "sit_ids", "labels", "instances")
    val rows = Validator.explodeAssignments(df)
      .orderBy("sit_id").collect()
      .map(r => (r.getAs[String]("sit_id"), r.getAs[String]("label"),
        r.getAs[Int]("instances")))
    // missing labels default TP, missing instances default 1
    assert(rows.toSeq == Seq(("A", "TP", 5), ("B", "TP", 1), ("C", "TP", 1)))
  }

  test("means: avg sits per doc and instances") {
    val m = Validator.means(mapping).collect()(0)
    assert(math.abs(m.getDouble(0) - 1.0) < 1e-9) // every doc has 1 sit
    assert(math.abs(m.getDouble(1) - (2 + 2 + 1 + 1 + 1) / 5.0) < 1e-9)
  }

  test("report aggregate plan broadcast-joins the dim and keeps one exchange") {
    val v = Validator.verdicts(Validator.explodeAssignments(mapping), corpus, sitDim)
    val plan = Validator.report(v).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
