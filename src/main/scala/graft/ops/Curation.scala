package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data preparation: PII redaction
  * (the inverse of the pipeline's detection stage — same SIT dimension),
  * deterministic dataset splitting, and quality filtering. All narrow
  * per-row expressions; the split is pure key arithmetic so it is
  * reproducible across engines, runs and partitionings (never `rand()`).
  */
object Curation {

  /** Redact every match of `patterns` (name → regex) with `[NAME]` tokens —
    * a fold of `regexp_replace` over the pattern table (plan constants,
    * compiled once per task). Returns (text', n_redactions) columns. */
  def redactCol(text: Column, patterns: Seq[(String, String)]): Column =
    patterns.foldLeft(text) { case (t, (name, regex)) =>
      regexp_replace(t, regex, s"[$name]")
    }

  /** Number of redactions `redactCol` would make (sum of match counts). */
  def redactionCountCol(text: Column, patterns: Seq[(String, String)]): Column =
    patterns.map { case (_, regex) =>
      size(regexp_extract_all(text, lit(regex), lit(0)))
    }.reduce(_ + _).cast("long")

  /** Redact the regex-bearing SITs of a dimension over `textCol`. */
  def redactSits(df: DataFrame, textCol: String,
                 sitDim: Seq[graft.pipeline.SitDef]): DataFrame = {
    val pats = sitDim.filter(_.regex.nonEmpty).map(s => s.id -> s.regex)
    df.withColumn("n_redactions", redactionCountCol(col(textCol), pats))
      .withColumn("redacted_text", redactCol(col(textCol), pats))
  }

  /** Deterministic train/val/test assignment from key arithmetic:
    * bucket = (key·2654435761) mod 1000; thresholds are per-mille weights.
    * Engine-portable (plain integer arithmetic, no hash function). */
  def splitCol(key: Column, trainPerMille: Int = 800,
               valPerMille: Int = 100): Column = {
    val b = pmod(key * 2654435761L, lit(1000L))
    when(b < trainPerMille, "train")
      .when(b < trainPerMille + valPerMille, "val")
      .otherwise("test")
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥ `minHits`
    * word `n`-grams with any benchmark document — the standard guard
    * against evaluation-set leakage into training data.
    *
    * Scale shape: both sides explode to distinct (id, shingle) rows; the
    * benchmark side (eval suites — small by definition) is broadcast, so
    * the corpus never shuffles. Output: (id, n_contaminated, benchmark
    * doc count it overlaps) per flagged corpus doc. */
  def decontaminationFlags(corpus: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String, n: Int = 3,
                           minHits: Int = 1): DataFrame = {
    val corpusInv = corpus.select(col(idCol).cast("long").as("id"),
      explode(array_distinct(Dedup.shinglesCol(col(textCol), n))).as("shingle"))
    val benchInv = benchmark.select(
      col(idCol).cast("long").as("bench_id"),
      explode(array_distinct(Dedup.shinglesCol(col(textCol), n))).as("shingle"))
    corpusInv.join(broadcast(benchInv), "shingle")
      .groupBy("id")
      .agg(countDistinct(col("shingle")).as("n_contaminated"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_contaminated") >= minHits)
  }

  /** The clean corpus: everything not flagged by [[decontaminationFlags]]. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 3,
                    minHits: Int = 1): DataFrame =
    corpus.join(
      decontaminationFlags(corpus, benchmark, idCol, textCol, n, minHits)
        .select(col("id").cast("long").as(idCol)),
      Seq(idCol), "left_anti")

  /** Deterministic stratified Bernoulli sampling: keep a row iff its
    * key's hash bucket falls under its stratum's per-mille rate —
    * down/up-weighting data sources or languages is the standard corpus
    * mixing step. Pure key arithmetic (portable, retry-safe, no rand());
    * the multiplier is offset from [[splitCol]]'s so sampling is
    * decorrelated from split assignment. */
  def stratifiedSampleCol(key: Column, stratum: Column,
                          ratesPerMille: Map[String, Int],
                          defaultPerMille: Int = 0): Column = {
    val bucket = pmod(key * 2654435761L + 40503L, lit(1000L))
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    bucket < rate
  }

  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       ratesPerMille: Map[String, Int],
                       defaultPerMille: Int = 0): DataFrame =
    df.filter(stratifiedSampleCol(col(keyCol), col(stratumCol),
      ratesPerMille, defaultPerMille))

  /** Quality gate: keep docs with score ≥ threshold and near-dup-free
    * (callers pass drop ids from a Dedup variant). */
  def qualityFilter(df: DataFrame, textCol: String, minScore: Double,
                    dropIds: DataFrame = null, idCol: String = "doc_id"): DataFrame = {
    val scored = df.withColumn("quality_score",
      TextAnalysis.qualityScoreCol(col(textCol)))
      .filter(col("quality_score") >= minScore)
    if (dropIds == null) scored
    else scored.join(
      dropIds.select(col("id").cast("long").as(idCol)), Seq(idCol), "left_anti")
  }
}
