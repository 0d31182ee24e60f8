package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained character-n-gram Naive Bayes language identifier — the
  * data-driven sibling of `TextAnalysis.langIdCol`'s marker-word argmax
  * (markers need a hand-seeded wordlist per language; this model learns
  * its evidence from any labeled corpus, e.g. a crawl's self-declared
  * lang tags, and generalizes to languages with no curated markers).
  *
  * Arithmetic follows the repo's integer micro-nat discipline (same as
  * the surprisal/BM25 lanes): every log-probability is
  * `round(10⁶·ln(x))` as a BIGINT, scores are integer sums, and the
  * argmax breaks ties on the smaller lang string — so training AND
  * inference are engine-exact and the whole train→classify chain sits
  * behind a DuckDB oracle (q98).
  *
  * Model (add-one smoothing over the corpus gram vocabulary V):
  *   w(L,g)     = round(10⁶·ln((c(L,g)+1)/(tot(L)+V)))
  *   default(L) = round(10⁶·ln(1/(tot(L)+V)))         — unseen gram
  *   prior(L)   = round(10⁶·ln(docs(L)/docs))
  *   score(d,L) = prior(L) + Σ_seen tf·w(L,g) + (n_d−tf_seen)·default(L)
  *
  * Scale shape: gram keys are at most |charset|ⁿ distinct (a few
  * thousand for bigrams) regardless of corpus size, so training is two
  * map-side-combining aggregates whose outputs are TINY; the weight
  * table broadcasts, classification is one broadcast join over per-doc
  * gram counts plus one (id, lang)-keyed aggregate — no corpus-sized
  * shuffle carries anything but 8-byte ids and short grams. The (docs ×
  * langs) spine is a broadcast of a ≤|langs|-row frame.
  * [[langIdTrained]] (train + self-classify, the q98 surface) tokenizes
  * the corpus ONCE: the per-doc gram arrays are materialized via
  * `localCheckpoint` and both the training counts and the inference tfs
  * derive from that one frame (r7 verdict #6 — previously the dominant
  * tokenize ran twice). */
object LangModel {

  /** Overlapping character n-grams of lower(text) over Unicode CODE
    * POINTS — positions 1..cps−n+1, matching DuckDB's code-point
    * `substr`/`len` semantics exactly (a UTF-16 code-unit walk would
    * split surrogate pairs on non-BMP text and disagree with the q98
    * oracle — r7 advice). Docs shorter than `n` code points have none. */
  def charNgrams(text: String, n: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val cps = t.codePoints().toArray
    if (cps.length < n) Seq.empty
    else (0 to cps.length - n).map(i => new String(cps, i, n))
  }

  private val charNgramsUdf = udf(charNgrams _)

  /** Trained model: `gramWeights` (lang, gram, w_micro) and `langStats`
    * (lang, prior_micro, default_micro) — both bounded by the charset,
    * not the corpus. */
  case class NaiveBayesModel(gramWeights: DataFrame, langStats: DataFrame)

  private def microLn(x: Column): Column =
    round(log(x) * 1000000).cast("long")

  /** Training tail shared by [[trainLangNB]] and [[langIdTrained]]:
    * `grams` = one (lang, gram) row per gram occurrence; `docsPerLang` /
    * `nDocs` count the labeled docs (all docs, gram-less included). */
  private def trainFromGrams(grams: DataFrame, docsPerLang: DataFrame,
                             nDocs: DataFrame): NaiveBayesModel = {
    // counts is the ONLY aggregate that touches the full gram stream, and
    // it is charset-bounded tiny (≤ langs·|charset|ⁿ rows) — but it feeds
    // THREE separate subtrees (gramWeights, vocab, totals; langStats pulls
    // totals+vocab again), and Spark plans each DataFrame reuse as an
    // independent subtree, so without a cut the corpus-wide explode +
    // aggregate ran up to 4× per q98 call (r16 plan audit: the
    // HashAggregate+Exchange pair over the exploded grams appeared 4 times
    // in the before plan). One eager localCheckpoint of the tiny counts
    // frame runs it ONCE; everything downstream is arithmetic over ≤ a few
    // thousand rows. Measured NEUTRAL at sf0.1 (isolated same-window
    // 3-rep medians 4.27 → 4.17 s — the local wall is plan codegen +
    // the per-job floor, not the recompute; the before plan's 4 gram
    // aggregates each cover only ~5k docs here). Kept for the scale
    // shape: at 100 TB each duplicated subtree is a full corpus
    // explode + shuffle, and the checkpoint caps that at one.
    val counts = grams.groupBy("lang", "gram")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // V = corpus-wide distinct gram vocabulary; tot(L) = gram occurrences
    // in L; both tiny aggregates over the charset-bounded key space
    val vocab = counts.select("gram").distinct()
      .agg(count(lit(1)).as("v"))
    val totals = counts.groupBy("lang").agg(sum("c").as("tot"))
    val gramWeights = counts
      .join(broadcast(totals), "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("gram"),
        microLn((col("c") + lit(1.0)) / (col("tot") + col("v")))
          .as("w_micro"))
    val langStats = docsPerLang
      .join(broadcast(totals), "lang").crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nDocs))
      .select(col("lang"),
        microLn(col("n_docs").cast("double") / col("n_all")).as("prior_micro"),
        microLn(lit(1.0) / (col("tot") + col("v"))).as("default_micro"))
    NaiveBayesModel(gramWeights, langStats)
  }

  def trainLangNB(df: DataFrame, textCol: String, labelCol: String,
                  n: Int = 2): NaiveBayesModel =
    trainFromGrams(
      df.select(col(labelCol).as("lang"),
        explode(charNgramsUdf(col(textCol), lit(n))).as("gram")),
      df.groupBy(col(labelCol).as("lang")).agg(count(lit(1)).as("n_docs")),
      df.agg(count(lit(1)).as("n_all")))

  /** Classification tail: `docGrams` = (id, gram, tf); `nGrams` =
    * (id, n_grams) — n_grams MUST count the same grams `docGrams` was
    * built from (the unseen-gram term is n_grams − tf_seen), which both
    * public entry points guarantee by deriving the two from one gram
    * array per doc. */
  private def classifyFromGrams(model: NaiveBayesModel, docGrams: DataFrame,
                                nGrams: DataFrame): DataFrame = {
    val seen = docGrams.join(broadcast(model.gramWeights), "gram")
      .groupBy("id", "lang")
      .agg(sum(col("tf") * col("w_micro")).as("sum_seen"),
        sum("tf").as("tf_seen"))
    // SHUFFLE_HASH (r16): both sides are (docs × langs)-class frames
    // keyed (id, lang); the default sort-merge join SORTED each — the
    // hash join's per-partition build is rows/partitions, the same
    // bound stripRepeatedSpans' hinted join documents.
    // The per-doc argmax is a min_by over (−score, lang): the struct
    // ordering is exactly `score DESC, lang ASC` (scores are micro-nat
    // longs ≤ ~10¹³, negation is overflow-safe), and langStats carries
    // one row per lang so the ordering key is total per (id, lang) —
    // identical rows to the former rank-1 window, but as a map-side-
    // combinable HashAggregate instead of a per-id sort (r16: the
    // window's exchange carried docs×langs rows; the aggregate's
    // partials collapse to ≤ one row per id per task before the wire).
    nGrams.crossJoin(broadcast(model.langStats))
      .join(seen.hint("SHUFFLE_HASH"), Seq("id", "lang"), "left")
      .select(col("id"), col("lang"),
        (col("prior_micro")
          + coalesce(col("sum_seen"), lit(0L))
          + (col("n_grams") - coalesce(col("tf_seen"), lit(0L)))
            * col("default_micro")).as("score_micro"))
      .groupBy("id")
      .agg(min_by(
        struct(col("lang"), col("score_micro")),
        struct((-col("score_micro")).as("ns"), col("lang"))).as("best"))
      .select(col("id"), col("best.lang").as("pred_lang"),
        col("best.score_micro").as("score_micro"))
  }

  /** Classify every doc: (id, pred_lang, score_micro) — argmax language
    * by integer micro-nat score, ties to the smaller lang string. Docs
    * with zero grams (shorter than `n` code points) score prior-only.
    * n_grams derives from the SAME gram array as the tfs (one
    * `size(grams)` per doc), so the unseen-gram term is exact on any
    * Unicode content (r7 advice: a `length()`-based count disagreed on
    * non-BMP text). */
  def classifyLangNB(model: NaiveBayesModel, df: DataFrame, idCol: String,
                     textCol: String, n: Int = 2): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      charNgramsUdf(col(textCol), lit(n)).as("grams"))
    classifyFromGrams(model,
      base.select(col("id"), explode(col("grams")).as("gram"))
        .groupBy("id", "gram").agg(count(lit(1)).as("tf")),
      base.select(col("id"), size(col("grams")).cast("long").as("n_grams")))
  }

  /** Train on the labeled corpus, classify the same corpus — the
    * self-prediction surface the q98 oracle gates end-to-end. The
    * per-doc gram arrays materialize ONCE (`localCheckpoint`, the same
    * idiom as bm25TopK's fallback): training counts, per-doc tfs, and
    * the n_grams totals all read the checkpoint instead of re-running
    * the tokenize UDF over the corpus — at scale the tokenize is the
    * dominant compute and the checkpoint is ~2× the text bytes. */
  def langIdTrained(df: DataFrame, idCol: String, textCol: String,
                    labelCol: String, n: Int = 2): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
        col(labelCol).as("lang"),
        charNgramsUdf(col(textCol), lit(n)).as("grams"))
      .localCheckpoint()
    val exploded = base.select(col("id"), col("lang"),
      explode(col("grams")).as("gram"))
    val model = trainFromGrams(
      exploded.select("lang", "gram"),
      base.groupBy("lang").agg(count(lit(1)).as("n_docs")),
      base.agg(count(lit(1)).as("n_all")))
    classifyFromGrams(model,
      exploded.groupBy("id", "gram").agg(count(lit(1)).as("tf")),
      base.select(col("id"), size(col("grams")).cast("long").as("n_grams")))
  }
}
