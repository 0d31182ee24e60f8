package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer with a corpus-TRAINED merges table — the
  * real subword tokenizer behind exact token budgets for sequence packing
  * and chunking (the reference counts whitespace words,
  * `modules/content_generator.py:308`; training pipelines budget in
  * subword tokens).
  *
  * Shape at 100 TB:
  *   - training's scale-heavy half is ONE word-count aggregation over the
  *     corpus (`groupBy(word).count` — the same map-side-combining shuffle
  *     as [[TextAnalysis.bigramCounts]]), truncated to a `vocabSize`-row
  *     frequency table with a parallel TakeOrdered. The greedy merge loop
  *     itself runs on that BOUNDED table driver-side (GPT-2 trains on a
  *     word-frequency table the same way) — vocabSize rows by
  *     construction, never corpus-sized;
  *   - encoding broadcasts the merges (a few KB) in the task closure and
  *     is a narrow one-pass kernel — no shuffle anywhere.
  *
  * Determinism: pair ties break by (count desc, pair lexicographic asc),
  * so the trained table — and therefore every encoded token — is
  * engine-portable; the q81 oracle RETRAINS the same merges in DuckDB
  * from the same parquet via unrolled list-op stages and must agree
  * hash-for-hash.
  *
  * Merge application uses the standard left-to-right non-overlapping
  * scan ("aaa" + (a,a) → ["aa","a"]). Applying the rules one at a time
  * in rank order equals the classic lowest-rank-first loop because a
  * merge at rank k only ever creates adjacencies involving its own new
  * symbol, which no pair of rank < k mentions — [[encodeWord]] exploits
  * that with a single rank-map loop; the literal rule-by-rule twin
  * [[encodeWordSequential]] is what the SQL oracle mirrors, and
  * KernelPropertySpec pins the two equal on random inputs.
  */
object Bpe {

  private val TokenPattern = java.util.regex.Pattern.compile("[a-z0-9']+")

  /** Lowercase word tokens (lock-step with [[TextAnalysis.tokensCol]]). */
  private[ops] def wordTokens(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val m = TokenPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One left-to-right non-overlapping application of merge (a,b). */
  private[ops] def mergeOnce(parts: List[String], a: String,
                             b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    parts.foreach { tok =>
      if (out.nonEmpty && out.last == a && tok == b)
        out.update(out.length - 1, a + b)
      else out += tok
    }
    out.toList
  }

  /** Greedy BPE training on a word-frequency table: `nMerges` rounds of
    * (count adjacent pairs weighted by word freq) → (merge the most
    * frequent pair, ties to the lexicographically smallest). The table is
    * bounded (vocabSize rows) so this is driver-side by design. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var splits: Map[String, List[String]] =
      wordCounts.map { case (w, _) => w -> w.map(_.toString).toList }.toMap
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      wordCounts.foreach { case (w, f) =>
        splits(w).iterator.sliding(2).withPartial(false).foreach { p =>
          val key = (p.head, p(1))
          pairCounts.update(key, pairCounts.getOrElse(key, 0L) + f)
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        splits = splits.map { case (w, p) =>
          w -> mergeOnce(p, best._1, best._2)
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Corpus → trained merges: the word-count shuffle (scale half) + the
    * driver loop over the bounded table ([[train]]). */
  def trainOnCorpus(df: DataFrame, textCol: String, vocabSize: Int = 200,
                    nMerges: Int = 16): Seq[(String, String)] = {
    val vocab = df
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(vocab, nMerges)
  }

  /** Literal rank-order rule application — the oracle's exact mirror. */
  private[ops] def encodeWordSequential(word: String,
                                        merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (p, (a, b)) =>
      mergeOnce(p, a, b)
    }

  /** Rank-map encoding: repeatedly merge the lowest-rank adjacent pair —
    * O(len · #rounds) with rank lookup O(1), independent of table size
    * (the production shape for 32k-merge tables). Equal to
    * [[encodeWordSequential]] by the rank argument in the scaladoc. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    var parts = word.map(_.toString).toList
    var continue = parts.lengthCompare(1) > 0
    while (continue) {
      var best = Int.MaxValue
      var bestPair: (String, String) = null
      parts.iterator.sliding(2).withPartial(false).foreach { p =>
        val r = ranks.getOrElse((p.head, p(1)), Int.MaxValue)
        if (r < best) { best = r; bestPair = (p.head, p(1)) }
      }
      if (bestPair == null) continue = false
      else parts = mergeOnce(parts, bestPair._1, bestPair._2)
    }
    parts
  }

  /** Encode a corpus with a trained merges table: narrow one-pass kernel,
    * merges ship in the closure. Output: `idCol`, `bpe_tokens`
    * (array<string>, doc order), `n_bpe`. Docs with no word tokens are
    * dropped (nothing to encode — the oracle's inner-join semantics). */
  /** Bound on the per-task word memo below: documents repeat words
    * heavily (zipfian), so one encode per distinct word per TASK beats
    * one per distinct word per ROW — but an adversarial all-unique
    * vocabulary must not grow task state without bound, so past the cap
    * the memo stops admitting and extra words encode directly. 64k
    * encoded words ≈ a few MB. */
  private val TaskMemoMaxWords = 1 << 16

  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    // The memo lives in the UDF closure OUTSIDE the lambda: each task
    // deserializes its own private copy (single-threaded within the
    // task), so distinct words encode once per task, not once per row
    // (r16, guide §4.5 — state amortized across the whole partition).
    // CONTRACT (r16 advice): this per-task-private-copy scoping is what
    // makes the unsynchronized HashMap safe, and it additionally relies
    // on asNondeterministic() below — dropping that marking would
    // re-enable driver-side/local-relation evaluation of the expression,
    // where the ONE driver-resident closure copy could be shared across
    // evaluation sites. Keep the marking and the memo together.
    val taskMemo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    val encodeUdf = udf { (text: String) =>
      wordTokens(text).flatMap { w =>
        taskMemo.get(w) match {
          case Some(parts) => parts
          case None =>
            val parts = encodeWord(w, ranks)
            if (taskMemo.size < TaskMemoMaxWords) taskMemo.update(w, parts)
            parts
        }
      }
    // asNondeterministic (it IS deterministic — guide §4.4's documented
    // trade): without it the optimizer substitutes the UDF expression
    // into the size(...) > 0 filter below and pushes that BELOW this
    // project, evaluating the whole BPE encode twice per row (r16 plan
    // audit: `Condition: size(UDF(text), false) > 0` under a separate
    // `UDF(text) AS bpe_tokens` project). Marking it keeps one
    // evaluation; the filter then tests the computed column.
    }.asNondeterministic()
    df.select(col(idCol), encodeUdf(col(textCol)).as("bpe_tokens"))
      .filter(size(col("bpe_tokens")) > 0)
      .withColumn("n_bpe", size(col("bpe_tokens")).cast("long"))
  }
}
