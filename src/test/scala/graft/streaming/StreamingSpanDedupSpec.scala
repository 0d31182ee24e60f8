package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming span-dedup lane: micro-batch spans equal the batch
  * incremental lane (and therefore `repeatedSpans` over the accumulated
  * corpus, restricted per batch — IncrementalDedupSpec pins that
  * equality), state advances to exactly the direct occurrence table, a
  * replayed batch is idempotent, and the [[OccStateStore]] scale
  * contracts hold: a batch touching b buckets writes exactly b bucket
  * directories (r10 verdict weak mark — the advance must be O(batch),
  * not O(|state|)), compaction preserves content, retention GCs old
  * versions and unreferenced segments. */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val common = "alpha bravo charlie delta echo foxtrot"
  private val rep = "papa quebec romeo sierra tango"
  // batch 0 seeds `common` once and `rep` twice (rep covered immediately);
  // batch 1 re-uses `common` (covered only via batch-0 history) and seeds
  // nothing new; batch 2 re-uses `rep` (covered via batch-0 history)
  private val b0 = Seq(
    (1L, s"one two $common three"),
    (2L, s"$rep zulu $rep"))
  private val b1 = Seq(
    (11L, s"x1 x2 x3 $common"),
    (12L, "mike november oscar whiskey xray yankee"))
  private val b2 = Seq(
    (21L, s"y1 y2 $rep y3"))

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "span_id", "span_start", "span_end", "n_shingles")
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSeq

  private def occMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("stream over three micro-batches == chained batch incremental " +
    "lane; state == direct occurrence table; replay idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_stream_").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingSpanDedup.spanDedupStream(
      stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$root/state", s"$root/spans",
      s"$root/ckpt", n = 5)
    try {
      for (b <- Seq(b0, b1, b2)) {
        stream.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    // streamed spans (all batches) == the chained batch-incremental lane
    val streamed = spark.read.parquet(s"$root/spans")
    val occ0 = Dedup.shingleOccurrenceTable(b0.toDF("doc_id", "text"),
      "text", n = 5)
    val inc0 = Dedup.incrementalRepeatedSpans(b0.toDF("doc_id", "text"),
      "doc_id", "text",
      spark.emptyDataset[(Long, Long)].toDF("shingle", "occ"), n = 5)
    val occ1 = Dedup.mergeOccurrenceTables(occ0,
      Dedup.shingleOccurrenceTable(b1.toDF("doc_id", "text"), "text", n = 5))
    val inc1 = Dedup.incrementalRepeatedSpans(b1.toDF("doc_id", "text"),
      "doc_id", "text", occ0, n = 5)
    val inc2 = Dedup.incrementalRepeatedSpans(b2.toDF("doc_id", "text"),
      "doc_id", "text", occ1, n = 5)
    assert(spanRows(streamed) ===
      spanRows(inc0.unionByName(inc1).unionByName(inc2)))
    // the engineered history crossings actually fired: doc 2's
    // within-batch repeat in batch 0, doc 11 via batch-0's common, doc 21
    // via batch-0's rep; doc 12 clean
    assert(spanRows(streamed).map(_._1).distinct.sorted === Seq(2L, 11L, 21L))
    // per-batch attribution is carried by the partition column
    assert(streamed.filter(col("batch_id") === 1L)
      .select("id").as[Long].collect().toSet === Set(11L))

    // final persisted state (aggregated read) == the direct table over
    // everything — through the bucketed segment layout
    val store = OccStateStore.open(spark, s"$root/state")
    assert(store.versions() === Seq(0L, 1L, 2L))
    val direct = Dedup.shingleOccurrenceTable(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "text", n = 5)
    assert(occMap(store.readAggregated(2L)) === occMap(direct))

    // replay idempotency: re-running batch 1 (a foreachBatch retry)
    // rewrites the same outputs — no span duplication, identical state
    // (retainVersions=3 keeps v=0, the predecessor a replay reads)
    val preReplay = spanRows(streamed)
    StreamingSpanDedup.processBatch(b1.toDF("doc_id", "text"), 1L,
      "doc_id", "text", s"$root/state", s"$root/spans", n = 5)
    // the overwrite replaced part files under batch_id=1 — drop the
    // cached file listing before re-reading
    spark.catalog.refreshByPath(s"$root/spans")
    assert(spanRows(spark.read.parquet(s"$root/spans")) === preReplay)
    val directV1 = Dedup.shingleOccurrenceTable(
      (b0 ++ b1).toDF("doc_id", "text"), "text", n = 5)
    assert(occMap(store.readAggregated(1L)) === occMap(directV1))
  }

  test("EMPTY micro-batch (all docs shorter than n tokens) advances " +
    "cleanly — zero-shingle delta, zone sidecar, positions partition — " +
    "and later batches still probe the full history") {
    // regression: an empty dynamic-partitioned write leaves only _SUCCESS
    // (no parquet files), so the store's read-back of its own delta must
    // state the schema explicitly — inference threw, and a foreachBatch
    // replay threw identically: a permanently wedged stream
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_empty_").toString
    def step(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingSpanDedup.processBatch(rows.toDF("doc_id", "text"), id,
        "doc_id", "text", s"$root/state", s"$root/spans", n = 5,
        positionsPath = s"$root/pos")
    step(b0, 0L)
    step(Seq((31L, "too short"), (32L, "also tiny")), 1L) // 0 shingles
    step(b2, 2L)
    val store = OccStateStore.open(spark, s"$root/state")
    assert(store.versions() === Seq(0L, 1L, 2L))
    // state is unchanged by the empty advance; b2's doc still finds
    // batch-0's rep through the pruned probe
    assert(occMap(store.readAggregated(1L)) ===
      occMap(Dedup.shingleOccurrenceTable(b0.toDF("doc_id", "text"),
        "text", n = 5)))
    val spans = spark.read.parquet(s"$root/spans")
    assert(spans.filter(col("batch_id") === 1L).count() === 0L)
    assert(spans.filter(col("batch_id") === 2L)
      .select("id").as[Long].collect().toSet === Set(21L))
  }

  test("positions read-back substitution: the probe over the re-read " +
    "positions parquet == the probe over the live shEx frame (the bulk " +
    "regime's third-kernel-pass fix)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_posrb_").toString
    val (shEx, counts) = Dedup.prepareIncrementalBatch(
      b1.toDF("doc_id", "text"), "doc_id", "text", n = 5)
    try {
      shEx.select(col("id"), col("pos"), col("shingle"))
        .write.mode("overwrite").parquet(s"$root/pos")
      val baseOcc = Dedup.shingleOccurrenceTable(b0.toDF("doc_id", "text"),
        "text", n = 5)
      val readBack = spark.read
        .schema("id BIGINT, pos INT, shingle BIGINT").parquet(s"$root/pos")
      assert(spanRows(Dedup.incrementalSpansPrepared(readBack, counts,
          baseOcc, n = 5)) ===
        spanRows(Dedup.incrementalSpansPrepared(shEx, counts,
          baseOcc, n = 5)))
      assert(spanRows(Dedup.incrementalSpansPrepared(readBack, counts,
        baseOcc, n = 5)).nonEmpty)
    } finally { shEx.unpersist(); counts.unpersist() }
  }

  test("state advance is O(batch): a batch touching b buckets writes " +
    "exactly those bucket dirs; untouched buckets carry forward unchanged") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_store_").toString
    val B = 64
    val store = OccStateStore.open(spark, root, numBuckets = B)
    // batch 0: a broad base (touches many buckets)
    store.advance(Dedup.shingleOccurrenceTable(
      b0.toDF("doc_id", "text"), "text", n = 5), 0L)
    val m0 = store.bucketSegments(0L)
    // batch 1: ONE doc, two 5-gram shingles — touches at most 2 buckets
    val tiny = Seq((42L, "uu vv ww xx yy zz")).toDF("doc_id", "text")
    val tinyCounts = Dedup.shingleOccurrenceTable(tiny, "text", n = 5)
    val expectedTouched = tinyCounts
      .select(pmod(col("shingle"), lit(B.toLong)).cast("int"))
      .as[Int].collect().toSet
    assert(expectedTouched.nonEmpty && expectedTouched.size <= 2)
    store.advance(tinyCounts, 1L)
    val m1 = store.bucketSegments(1L)
    // the delta segment holds exactly the touched bucket dirs
    val deltaDirs = new java.io.File(s"$root/segments/seg-1-delta")
      .listFiles().filter(_.getName.startsWith("b="))
      .map(_.getName.stripPrefix("b=").toInt).toSet
    assert(deltaDirs === expectedTouched)
    // touched buckets stack the delta; every other bucket's segment list
    // (and therefore its bytes on disk) is carried forward verbatim
    expectedTouched.foreach { b =>
      assert(m1(b) === m0.getOrElse(b, Seq.empty) :+ "seg-1-delta")
    }
    (m0.keySet -- expectedTouched).foreach(b => assert(m1(b) === m0(b)))
    assert(m1.keySet === m0.keySet ++ expectedTouched)
  }

  test("bucket-pruned probe (r11 weak mark): the state read opens " +
    "EXACTLY the batch's bucket dirs (inputFiles, not just rows); spans " +
    "row-identical; one shingle-kernel evaluation per micro-batch") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_prune_").toString
    val B = 64
    val store = OccStateStore.open(spark, root, numBuckets = B)
    // broad base: many buckets populated
    val base = (b0 ++ b1).toDF("doc_id", "text")
    store.advance(Dedup.shingleOccurrenceTable(base, "text", n = 5), 0L)
    // tiny batch: few buckets touched
    val batch = b2.toDF("doc_id", "text").persist()
    batch.count()
    try {
      val (shEx, counts) = Dedup.prepareIncrementalBatch(
        batch, "doc_id", "text", n = 5)
      // prepared counts == the direct occurrence table for the batch
      assert(occMap(counts) ===
        occMap(Dedup.shingleOccurrenceTable(batch, "text", n = 5)))
      val touched = counts
        .select(pmod(col("shingle"), lit(B.toLong)).cast("int"))
        .distinct().as[Int].collect().toSet
      // FILE-level pin: the pruned read's scan opens only b=<touched>
      // dirs, and strictly fewer files than the full read (the base is
      // engineered broad, the batch narrow)
      val prunedFiles = store.readLatestBefore(1L, touched).inputFiles
      assert(prunedFiles.nonEmpty)
      val bucketOf = (f: String) =>
        "/b=(\\d+)/".r.findFirstMatchIn(f).get.group(1).toInt
      assert(prunedFiles.map(bucketOf).toSet.subsetOf(touched),
        s"pruned scan opened a bucket outside the batch's set")
      val fullFiles = store.readLatestBefore(1L).inputFiles
      assert(prunedFiles.length < fullFiles.length,
        s"expected pruning: ${prunedFiles.length} vs ${fullFiles.length}")
      // row identity: prepared probe over the PRUNED state == the
      // one-call probe over the FULL state
      val pruned = Dedup.incrementalSpansPrepared(shEx, counts,
        store.readLatestBefore(1L, touched), n = 5)
      val oneCall = Dedup.incrementalRepeatedSpans(batch, "doc_id",
        "text", store.readLatestBefore(1L), n = 5)
      assert(spanRows(pruned) === spanRows(oneCall))
      assert(spanRows(pruned).nonEmpty, "fixture must emit spans")
      // ONE shingle pass: the prepared probe's plan reads the CACHED
      // exchange (InMemoryTableScan leaves) — the shingle kernel is
      // EXECUTED nowhere in it (it ran once, inside
      // prepareIncrementalBatch). The plan STRING can't pin this: the
      // cache scan prints its cached plan as display-only provenance,
      // kernel name included. So the pin walks the EXECUTED SparkPlan
      // nodes (cache scans are leaves — their relation's plan is
      // provenance, not a child) and asserts no node evaluates the UDF.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.catalyst.expressions.ScalaUDF
      def executedNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => executedNodes(a.executedPlan)
        case q: QueryStageExec => executedNodes(q.plan)
        case other => other +: other.children.flatMap(executedNodes)
      }
      def evalsKernel(df: org.apache.spark.sql.DataFrame): Boolean =
        executedNodes(df.queryExecution.executedPlan)
          .exists(_.expressions.exists(_.exists {
            case u: ScalaUDF => u.udfName.exists(_.contains("posShingleHashes"))
            case _ => false
          }))
      assert(executedNodes(pruned.queryExecution.executedPlan)
        .exists(_.toString.startsWith("InMemoryTableScan")),
        "prepared probe should read the cache")
      assert(!evalsKernel(pruned),
        "prepared plan re-evaluates the shingle kernel")
      // while the caches LIVE, even an unrelated lazy call over the same
      // batch rides them (plan-fragment cache substitution) — the
      // sharing is cross-call, not just cross-frame
      assert(!evalsKernel(Dedup.incrementalRepeatedSpans(batch, "doc_id",
        "text", store.readLatestBefore(1L), n = 5,
        microBatchMaxBytes = Dedup.MicroBatchGateDisabled)))
      shEx.unpersist(); counts.unpersist()
      // contrast pin, post-unpersist: the kernel node IS found by the
      // same walker in a lazy plan with no cache to substitute — so the
      // absences above prove the kernel ran only inside
      // prepareIncrementalBatch, not that the walker is blind
      assert(evalsKernel(Dedup.incrementalRepeatedSpans(batch, "doc_id",
        "text", store.readLatestBefore(1L), n = 5,
        microBatchMaxBytes = Dedup.MicroBatchGateDisabled)))
    } finally batch.unpersist()
  }

  test("compaction cadence: a bucket collapses to one segment at " +
    "compactAt, content preserved; retention deletes old manifests and " +
    "GCs unreferenced segments") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_compact_").toString
    val store = OccStateStore.open(spark, root, numBuckets = 4,
      retainVersions = 2, compactAt = 3)
    // the same doc every batch: every bucket it touches stacks one delta
    // per batch, hitting the compactAt=3 cadence at batch 2
    val doc = Seq((7L, s"$common $rep")).toDF("doc_id", "text")
    def counts() = Dedup.shingleOccurrenceTable(doc, "text", n = 5)
    (0L to 3L).foreach(v => store.advance(counts(), v))
    // batch 2 stacked the 3rd delta -> compacted; batch 3 stacks one new
    // delta on top of that compact segment
    val m3 = store.bucketSegments(3L)
    m3.values.foreach { segs =>
      assert(segs === Seq("seg-2-compact", "seg-3-delta"), segs.toString)
    }
    // content through compaction == 4 x the direct table
    val direct4 = occMap(counts()).map { case (k, v) => k -> 4L * v }
    assert(occMap(store.readAggregated(3L)) === direct4)
    // retention: only the last 2 manifests survive ...
    assert(store.versions() === Seq(2L, 3L))
    // ... and segments referenced by NO retained manifest are GC'd
    // (deltas 0-2 were folded into seg-2-compact; v2's manifest already
    // references only the compact segment)
    val liveSegs = new java.io.File(s"$root/segments")
      .listFiles().map(_.getName).toSet
    assert(liveSegs === Set("seg-2-compact", "seg-3-delta"))
    // retained versions still read correctly after GC
    val direct3 = occMap(counts()).map { case (k, v) => k -> 3L * v }
    assert(occMap(store.readAggregated(2L)) === direct3)
    // write-once bucket routing: a mismatched EXPLICIT re-open fails
    // loudly, while the no-arg open ADOPTS the persisted value (readers
    // never plumb the writer's choice — r11 review)
    intercept[IllegalArgumentException] {
      OccStateStore.open(spark, root, numBuckets = 8)
    }
    assert(OccStateStore.open(spark, root).numBuckets === 4)
    // a clean window returns exactly the per-batch delta; a window whose
    // from-manifest retention GC'd fails loudly
    assert(occMap(Dedup.aggregateOccurrences(
      store.readDeltasBetween(2L, 3L))) === occMap(counts()))
    val eGc = intercept[IllegalArgumentException] {
      store.readDeltasBetween(1L, 3L)
    }
    assert(eGc.getMessage.contains("retained"))
  }

  test("readPruned: zone sidecars skip stacked delta files the batch's " +
    "keys provably miss (file-level pin); probe output row-identical") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_zones_").toString
    val B = 4 // coarse buckets: segments SHARE buckets, zones discriminate
    val store = OccStateStore.open(spark, root, numBuckets = B)
    // v0: broad base (its delta counts are checkpointed → real stats →
    // zone sidecar written); v1: a disjoint-keyed doc
    val base = (b0 ++ b1).toDF("doc_id", "text")
    store.advance(Dedup.shingleOccurrenceTable(base, "text", n = 5)
      .localCheckpoint(), 0L)
    store.advance(Dedup.shingleOccurrenceTable(
        Seq((99L, "m1 m2 m3 m4 m5 m6 m7 m8")).toDF("doc_id", "text"),
        "text", n = 5).localCheckpoint(), 1L)
    assert(new java.io.File(s"$root/segments/seg-0-delta/_zones").exists)
    assert(new java.io.File(s"$root/segments/seg-1-delta/_zones").exists)
    // probe batch: overlaps seg-0's keys only (deterministic fixture —
    // xxhash keys and bloom bits are both fixed, so this never flakes)
    val batch = b2.toDF("doc_id", "text").persist()
    batch.count()
    try {
      val (shEx, counts) = Dedup.prepareIncrementalBatch(
        batch, "doc_id", "text", n = 5)
      val pruned = store.readPruned(2L, counts)
      val prunedFiles = pruned.inputFiles
      assert(prunedFiles.nonEmpty)
      assert(!prunedFiles.exists(_.contains("seg-1-delta")),
        s"zone pruning should skip the disjoint delta:\n" +
          prunedFiles.mkString("\n"))
      assert(prunedFiles.exists(_.contains("seg-0-delta")))
      // row identity through the sharper read
      assert(spanRows(Dedup.incrementalSpansPrepared(shEx, counts,
          pruned, n = 5)) ===
        spanRows(Dedup.incrementalSpansPrepared(shEx, counts,
          store.readLatestBefore(2L), n = 5)))
      // executor-level bloom cache (r14 verdict item 2): the probes
      // above deserialized this store's sidecar blooms into the
      // JVM-wide cache; a REPEATED probe (fresh planning job, fresh
      // per-task ZoneProbe instances) must not deserialize again
      val missesBefore = graft.ops.ZoneIndex.BloomCache.missCount
      store.readPruned(2L, counts).count()
      assert(graft.ops.ZoneIndex.BloomCache.missCount === missesBefore,
        "a repeated probe must reuse the executor-level bloom cache")
      shEx.unpersist(); counts.unpersist()
    } finally batch.unpersist()
  }

  test("out-of-band compactNow: content-equivalent manifest rewrite, " +
    "stacks collapse, replay of the latest batch stays correct, delta " +
    "windows crossing it are refused") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_maint_").toString
    // inline compaction parked far away: maintenance is the one under test
    val store = OccStateStore.open(spark, root, numBuckets = 4,
      retainVersions = 4, compactAt = 10)
    val doc = Seq((7L, s"$common $rep")).toDF("doc_id", "text")
    def counts() = Dedup.shingleOccurrenceTable(doc, "text", n = 5)
    (0L to 2L).foreach(v => store.advance(counts(), v))
    val pre = occMap(store.readAggregated(2L))
    assert(store.bucketSegments(2L).values.forall(_.size === 3))
    // compact all stacks; content identical; second call is a no-op
    assert(store.compactNow() > 0)
    store.bucketSegments(2L).values.foreach(segs =>
      assert(segs === Seq("seg-2-maint0-compact"), segs.toString))
    assert(occMap(store.readAggregated(2L)) === pre)
    assert(store.compactNow() === 0)
    // a delta window crossing the maintenance compaction is refused —
    // same double-count guard as the inline path
    val eW = intercept[IllegalArgumentException] {
      store.readDeltasBetween(1L, 2L)
    }
    assert(eW.getMessage.contains("compact"))
    // replay of the LATEST batch after maintenance: rebuilds manifest 2
    // from the untouched predecessor — the maint segment is stranded
    // (GC'd on the next retire) and the sums are unchanged
    store.advance(counts(), 2L)
    assert(occMap(store.readAggregated(2L)) === pre)
    // next advance stacks on whatever manifest 2 now holds; content 4x
    store.advance(counts(), 3L)
    assert(occMap(store.readAggregated(3L)) ===
      occMap(counts()).map { case (k, v) => k -> 4L * v })
  }

  test("driver-cadence retroactive sweep (sweepEvery): each sweep == the " +
    "manually-composed pair-form sweep; composed serving view == the " +
    "batch recompute over everything ingested") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_sweep_").toString
    implicit val sqlCtx = spark.sqlContext
    // crossings that only a SWEEP can surface: phrase A seeds in batch 0
    // (occ 1 — no arrival span) and recurs in batch 2; phrase B seeds in
    // batch 1 and recurs in batch 4. Sweeps fire at v2 (window (0,2])
    // and v4 ((2,4]) with sweepEvery = 2.
    val phA = "alpha bravo charlie delta echo"
    val phB = "papa quebec romeo sierra tango"
    val batches = Seq(
      Seq((1L, s"a1 a2 $phA a3")),
      Seq((11L, s"b1 $phB b2 b3")),
      Seq((21L, s"c1 c2 c3 $phA")),
      Seq((31L, "q1 q2 q3 q4 q5 q6 q7")),
      Seq((41L, s"d1 $phB d2")))
    val stream = MemoryStream[(Long, String)]
    val q = StreamingSpanDedup.spanDedupStream(
      stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$root/state", s"$root/spans", s"$root/ckpt",
      n = 5, sweepEvery = 2, positionsPath = s"$root/pos",
      sweepDir = s"$root/sweeps", compactAt = 8, retainVersions = 3)
    try {
      for (b <- batches) { stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    def docsDf(upTo: Int) =
      batches.take(upTo + 1).flatten.toDF("doc_id", "text")
    // sweep at v2 == pair-form sweep composed by hand from the known
    // batch data (delta==pair is RetroactiveSweepSpec's pin): positions
    // over everything ingested <= 2, prev state at the bookmark (v0),
    // current state at v2
    val sweep2 = spark.read.parquet(s"$root/sweeps/sweep_v=2")
    val twin2 = Dedup.retroactiveSpanSweep(
      Dedup.shinglePositionsTable(docsDf(2), "doc_id", "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(0), "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(2), "text", n = 5), n = 5)
    assert(spanRows(sweep2) === spanRows(twin2))
    // the engineered crossing fired: doc 1 (batch 0) re-emitted by the
    // sweep — its arrival saw occ(A) = 1
    assert(spanRows(sweep2).map(_._1).contains(1L))
    val sweep4 = spark.read.parquet(s"$root/sweeps/sweep_v=4")
    val twin4 = Dedup.retroactiveSpanSweep(
      Dedup.shinglePositionsTable(docsDf(4), "doc_id", "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(2), "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(4), "text", n = 5), n = 5)
    assert(spanRows(sweep4) === spanRows(twin4))
    assert(spanRows(sweep4).map(_._1).contains(11L))
    // serving composition: arrival spans, then each sweep in version
    // order overrides its affected ids — equals the batch recompute over
    // every doc ingested (the lambda claim, end to end)
    val arrival = spark.read.parquet(s"$root/spans")
      .select("id", "span_id", "span_start", "span_end", "n_shingles")
    val served = Seq(sweep2, sweep4).foldLeft(arrival) { (acc, sw) =>
      acc.join(sw.select("id").distinct(), Seq("id"), "left_anti")
        .unionByName(sw.select(
          "id", "span_id", "span_start", "span_end", "n_shingles"))
    }
    val full = Dedup.repeatedSpans(docsDf(4), "doc_id", "text", n = 5)
    assert(spanRows(served) === spanRows(full))
    assert(spanRows(served).nonEmpty)
  }

  test("positions compaction: manifest-committed chunks read exactly " +
    "once across every crash window; pruning includes a chunk exactly " +
    "when a probe key might hit it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pos_compact_").toString
    val pos = s"$root/pos"
    val ph = "alpha bravo charlie delta echo"
    val batches = Seq(
      Seq((1L, s"p1 $ph p2")), Seq((11L, "p3 p4 p5 p6 p7 p8")),
      Seq((21L, s"p9 $ph")), Seq((31L, "q1 q2 q3 q4 q5 q6")),
      Seq((41L, "r1 r2 r3 r4 r5 r6")), Seq((51L, s"r7 r8 $ph")))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingSpanDedup.processBatch(b.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", s"$root/state", s"$root/spans", n = 5,
        positionsPath = pos)
    }
    def posRows() = StreamingSpanDedup.readPositions(spark, pos)
      .orderBy("id", "pos").collect().map(_.toSeq).toSeq
    val before = posRows()
    assert(before.nonEmpty)

    // crash window A: a chunk dir exists but the manifest never
    // committed — readers must see the original dirs only (the orphan
    // chunk is invisible)
    Seq((99L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
      .select(col("doc_id").as("id"), lit(0).as("pos"),
        lit(123456L).as("shingle"))
      .write.parquet(s"$pos/_compacted/chunk=0/data")
    assert(posRows() === before)
    val fsRoot = new org.apache.hadoop.fs.Path(pos)
    val fs = graft.FsText.fs(spark, fsRoot)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pos/_compacted"), true)

    // fold batches 0..3 into chunk 0; composition identity holds.
    // Retirement is DEFERRED (next call's GC): the folded dirs still
    // exist — crash window B is therefore the NORMAL post-commit state —
    // but the manifest supersedes them, so reads stay exactly-once
    assert(StreamingSpanDedup.compactPositions(spark, pos, 3L,
      minDirs = 1) === 4)
    assert(posRows() === before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$pos/batch_id=0")),
      "retirement must defer to the next call's GC phase")

    // a superseded dir with GARBAGE rows (the lingering-dir window taken
    // to the adversarial extreme): both the full read and the pruned
    // read must skip it — the manifest, not the filesystem, is truth
    fs.delete(new org.apache.hadoop.fs.Path(s"$pos/batch_id=2"), true)
    Seq((666L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
      .select(col("doc_id").as("id"), lit(0).as("pos"),
        lit(999L).as("shingle"))
      .write.parquet(s"$pos/batch_id=2")
    assert(posRows() === before)
    val probe = graft.ops.Dedup
      .shingleOccurrenceTable(Seq((7L, ph)).toDF("doc_id", "text"),
        "text", n = 5)
    val pruned = StreamingSpanDedup.positionsPrunedBy(spark, pos, probe)
    assert(!pruned.inputFiles.exists(_.contains("batch_id=2")),
      "manifest-folded garbage dir must never be read")
    // the phrase lives in batches 0/2/5 → folded into chunk 0 and live
    // in batch_id=5: pruning must keep the chunk and batch 5, and may
    // drop the disjoint live batch 4
    assert(pruned.inputFiles.exists(_.contains("chunk=0")))
    assert(pruned.inputFiles.exists(_.contains("batch_id=5")))
    assert(!pruned.inputFiles.exists(_.contains("batch_id=4")))
    // a probe disjoint from everything prunes every zoned source
    val misses = StreamingSpanDedup.positionsPrunedBy(spark, pos,
      Seq((1L, 424242L)).toDF("occ", "shingle"))
    assert(!misses.inputFiles.exists(_.contains("chunk=0")))

    // the next compaction GCs the superseded dirs (incl. the garbage
    // copy) and folds 4..5 into a second chunk; the chunk written THIS
    // call never refolds in the same invocation (its rows would be
    // written twice for one cadence's gain)
    assert(StreamingSpanDedup.compactPositions(spark, pos, 5L,
      minDirs = 1) === 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$pos/batch_id=2")))
    assert(posRows() === before)
    assert(StreamingSpanDedup.readCompactManifest(spark, pos).size === 2)
    // a third call: GCs the now-superseded batch dirs, then the tiered
    // second level refolds the two small chunks into ONE
    // (refoldFactor = 1.0 — the deterministic-mechanics setting; the
    // default 2.0 amplification bound depends on relative chunk sizes)
    assert(StreamingSpanDedup.compactPositions(spark, pos, 5L,
      minDirs = 1, refoldFactor = 1.0) === 2)
    assert(posRows() === before)
    assert(StreamingSpanDedup.readCompactManifest(spark, pos).size === 1)
    // a fourth call: GCs the two superseded chunk dirs, then no-ops (a
    // single chunk never refolds into a copy of itself)
    assert(StreamingSpanDedup.compactPositions(spark, pos, 5L,
      minDirs = 1, refoldFactor = 1.0) === 0)
    assert(posRows() === before)
    val chunkDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$pos/_compacted")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("chunk="))
    assert(chunkDirs.size === 1, chunkDirs.toString)
    // a seeded base index at the documented batch_id=-1 convention is
    // never folded (its rows still serve every read)
    val nBefore = posRows().size
    Seq((777L, "s1 s2 s3 s4 s5 s6")).toDF("doc_id", "text")
      .select(col("doc_id").as("id"), lit(0).as("pos"),
        lit(31415L).as("shingle"))
      .write.parquet(s"$pos/batch_id=-1")
    assert(StreamingSpanDedup.compactPositions(spark, pos, 5L,
      minDirs = 1) === 0)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$pos/batch_id=-1")))
    assert(posRows().size === nBefore + 1)
  }

  test("sweep bookmark outside the retention window recovers instead of " +
    "wedging: sweeps from the oldest retained version, warns, advances " +
    "the bookmark") {
    // regression: sweeps disabled for a while (bookmark frozen while
    // retention retires its version) then re-enabled — BOTH sweep forms
    // need state(bookmark), so the sweep threw on every replay: a
    // permanently wedged stream until someone hand-deleted the bookmark
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_bkmk_").toString
    val ph = "alpha bravo charlie delta echo"
    val batches = Seq(
      Seq((1L, "s1 s2 s3 s4 s5 s6")),
      Seq((11L, "t1 t2 t3 t4 t5 t6")),
      Seq((21L, "u1 u2 u3 u4 u5 u6")),
      Seq((31L, s"v1 $ph v2")), // phrase seeds at v3 (occ 1 — no span)
      Seq((41L, "w1 w2 w3 w4 w5 w6")),
      Seq((51L, s"x1 x2 $ph"))) // recurs at v5 — only a sweep sees 31
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingSpanDedup.processBatch(b.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", s"$root/state", s"$root/spans", n = 5,
        positionsPath = s"$root/pos")
    }
    val store = OccStateStore.open(spark, s"$root/state")
    assert(store.versions() === Seq(3L, 4L, 5L)) // retainVersions = 3
    // a bookmark at a RETIRED version (sweeps were off while 0 retired)
    graft.FsText.writeAtomic(spark,
      new org.apache.hadoop.fs.Path(s"$root/state", "_graft_last_sweep"),
      "0")
    StreamingSpanDedup.maybeSweep(spark, s"$root/state", 5L,
      sweepEvery = 2, positionsPath = s"$root/pos",
      sweepDir = s"$root/sweeps", n = 5, minOcc = 2)
    // recovered: swept from the oldest retained version (3), not wedged
    def docsDf(upTo: Int) =
      batches.take(upTo + 1).flatten.toDF("doc_id", "text")
    val sweep = spark.read.parquet(s"$root/sweeps/sweep_v=5")
    val twin = Dedup.retroactiveSpanSweep(
      Dedup.shinglePositionsTable(docsDf(5), "doc_id", "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(3), "text", n = 5),
      Dedup.shingleOccurrenceTable(docsDf(5), "text", n = 5), n = 5)
    assert(spanRows(sweep) === spanRows(twin))
    assert(spanRows(sweep).map(_._1).contains(31L))
    assert(graft.FsText.read(spark,
      new org.apache.hadoop.fs.Path(s"$root/state", "_graft_last_sweep"))
      .trim === "5")
  }

  test("readDeltasBetween: state(to) == state(from) ⊎ deltas, the " +
    "retroactiveSpanSweepDelta input contract") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_delta_").toString
    val store = OccStateStore.open(spark, root)
    store.advance(Dedup.shingleOccurrenceTable(
      b0.toDF("doc_id", "text"), "text", n = 5), 0L)
    store.advance(Dedup.shingleOccurrenceTable(
      b1.toDF("doc_id", "text"), "text", n = 5), 1L)
    store.advance(Dedup.shingleOccurrenceTable(
      b2.toDF("doc_id", "text"), "text", n = 5), 2L)
    val recomposed = Dedup.aggregateOccurrences(
      store.read(0L).unionByName(store.readDeltasBetween(0L, 2L)))
    assert(occMap(recomposed) === occMap(store.readAggregated(2L)))

    // a window a COMPACTION crossed is refused — the compact segment
    // folds prior state in, so the fresh segments are not a pure delta
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_occ_delta2_").toString
    val s2 = OccStateStore.open(spark, root2, retainVersions = 4,
      compactAt = 3)
    val doc = Seq((7L, s"$common $rep")).toDF("doc_id", "text")
    (0L to 3L).foreach(v => s2.advance(
      Dedup.shingleOccurrenceTable(doc, "text", n = 5), v))
    val e = intercept[IllegalArgumentException] {
      s2.readDeltasBetween(1L, 3L) // spans the batch-2 compaction
    }
    assert(e.getMessage.contains("compact"))
  }

  test("sub-bucket tier (tier 3): corpus-mass segments split into " +
    "sb= files, content preserved, readPruned opens EXACTLY the probe " +
    "keys' (bucket, sub) files, no false negatives through mixed stacks") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_occ_sub_").toString
    val B = 2
    val store = OccStateStore.open(spark, root, numBuckets = B,
      compactAt = 9)
    // synthetic count tables big enough that COMPACTION derives a split
    // (exact manifest rows: 200k rows over 2 buckets → rowsPerBucket
    // 100k → pow2(100k/32768) = 4) while the deltas stay flat (the
    // micro regime)
    def counts(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("shingle"),
        (lit(1L) + pmod(col("id"), lit(3L))).as("occ"))
    store.advance(counts(0L, 100000L), 0L)
    assert(store.readManifestStats(0L).values.flatten
      .forall(_.subSplit === 1), "micro deltas must stay flat")
    store.advance(counts(50000L, 150000L), 1L)
    store.compactNow() // out-of-band fold derives the split from rows
    val stats1 = store.readManifestStats(1L)
    val compactStat = stats1.values.flatten
      .find(_.name.endsWith("-compact")).get
    assert(compactStat.subSplit === 4,
      s"compaction over 100k rows/bucket must split 4, got $compactStat")
    // layout: sb= dirs exist under each bucket of the compact segment
    val subDirs = new java.io.File(
      s"$root/segments/${compactStat.name}/b=0").listFiles()
      .filter(_.getName.startsWith("sb=")).map(_.getName).toSet
    assert(subDirs === (0 until 4).map(s => s"sb=$s").toSet)
    // content preserved through the split layout: per-shingle sums ==
    // hand-computed overlap sums
    def occOf(id: Long) = 1L + math.floorMod(id, 3L)
    val agg1 = occMap(store.readAggregated(1L))
    assert(agg1(7L) === occOf(7L)) // only delta 0
    assert(agg1(60000L) === 2L * occOf(60000L)) // both deltas
    assert(agg1(149999L) === occOf(149999L)) // only delta 1
    assert(agg1.size === 150000)

    // probeRead: probe keys → exactly their (b, sb) files open, through
    // the tier-4 row-filtered reader (the key count is far under the
    // gate). The expected pair set is computed with the SAME SQL
    // expressions the writer uses (pmod + xxhash64 — pure key functions).
    val probeKeys = Seq(5L, 77L, 100007L, 149998L, 33L)
    val keys = probeKeys.toDF("shingle")
    val expectPairs = keys.select(
        pmod(col("shingle"), lit(B.toLong)).cast("int"),
        pmod(xxhash64(col("shingle")), lit(4L)).cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val pr = store.probeRead(2L, keys)
    assert(pr.rowFiltered.nonEmpty,
      "a 5-key probe must take the tier-4 row-filtered path")
    val openedPairs = pr.rowFiltered.map { fk =>
      val m = "b=(\\d+)/sb=(\\d+)".r.findFirstMatchIn(fk.path).get
      (m.group(1).toInt, m.group(2).toInt)
    }.toSet
    assert(openedPairs === expectPairs,
      "tier 3 must open exactly the probe's (bucket, sub) files")
    // each file's predicate carries ONLY the keys routing to it
    pr.rowFiltered.foreach { fk =>
      val m = "b=(\\d+)/sb=(\\d+)".r.findFirstMatchIn(fk.path).get
      val (fb, fsb) = (m.group(1).toInt, m.group(2).toInt)
      val expectKeys = keys.filter(
          pmod(col("shingle"), lit(B.toLong)).cast("int") === fb &&
            pmod(xxhash64(col("shingle")), lit(4L)).cast("int") === fsb)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(fk.keys.toSeq === expectKeys, s"per-file keys at ${fk.path}")
    }
    val pruned = pr.frame
    // no false negatives: every probe key's full occurrence survives
    val prunedSlim = occMap(graft.ops.Dedup.aggregateOccurrences(
      pruned.join(keys, Seq("shingle"), "left_semi")))
    assert(prunedSlim === probeKeys.map(k => k -> agg1(k)).toMap)
    // accumulators snapshot right after the FIRST action (each further
    // action re-executes the probe RDD and accumulates again — the
    // documented valid-after-an-action contract)
    assert(pr.filesOpened.get.value === pr.rowFiltered.size.toLong)
    val bytesRead = pr.bytesRead.get.value
    assert(bytesRead > 0L)
    assert(pr.metaBytesRead.get.value > 0L,
      "cold probe loads footers + page indexes (counted as meta bytes)")
    // r14 verdict item 1: the SAME probe repeated re-reads ZERO footer
    // or index bytes (the per-executor MetaCache answers the plan), and
    // its page reads are byte-identical — the per-open floor is gone on
    // the warm path
    val metaMissBefore = SubFileProbe.MetaCache.missCount
    val pr2 = store.probeRead(2L, keys)
    pr2.frame.count()
    assert(SubFileProbe.MetaCache.missCount === metaMissBefore,
      "a repeated probe must not re-load any immutable file's metadata")
    assert(pr2.metaBytesRead.get.value === 0L)
    assert(pr2.bytesRead.get.value === bytesRead,
      s"warm page reads must be byte-identical " +
        s"(${pr2.bytesRead.get.value} vs $bytesRead)")
    // r14 verdict item 2: a micro batch plans on the DRIVER (one narrow
    // collect, no planJob shuffle), and the plan is BIT-EQUAL to the
    // distributed planJob's across the gate — same opened files, same
    // per-file keys, same whole paths, same rows (the hash-valued keys
    // exercise the floorMod/XXH64 twins of the write-side SQL routing)
    assert(pr2.driverPlanned, "a 5-key probe must plan on the driver")
    val prJob = store.probeRead(2L, keys,
      keyCountHint = OccStateStore.DriverPlanMaxKeys + 1)
    assert(!prJob.driverPlanned)
    assert(prJob.wholePaths === pr2.wholePaths)
    assert(prJob.rowFiltered.map(fk => (fk.path, fk.keys.toSeq)).toSet ===
      pr2.rowFiltered.map(fk => (fk.path, fk.keys.toSeq)).toSet,
      "driver plan and planJob must admit identical per-file key sets")
    assert(prJob.frame.collect().map(_.toSeq).toSet ===
      pr2.frame.collect().map(_.toSeq).toSet)
    // the ARRAY-keyed overload (r15 — processBatch's micro path: keys
    // collected once, plan with ZERO further jobs) must match both
    val prArr = store.probeRead(2L, probeKeys.toArray)
    assert(prArr.driverPlanned)
    assert(prArr.wholePaths === pr2.wholePaths)
    assert(prArr.rowFiltered.map(fk => (fk.path, fk.keys.toSeq)).toSet ===
      pr2.rowFiltered.map(fk => (fk.path, fk.keys.toSeq)).toSet)
    assert(prArr.frame.collect().map(_.toSeq).toSet ===
      pr2.frame.collect().map(_.toSeq).toSet)
    // tier 4 is EXACT on the row-filtered side: nothing but probe keys
    // comes back
    val gotKeys = pruned.select("shingle").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gotKeys === probeKeys.toSet,
      "row-filtered probe must return exactly the probe keys' rows")
    // page-level pruning bites: the admitted files' total size is well
    // above what the reader actually pulled (footer + the keys' pages) —
    // each 25k-row sub-file holds ~25 sorted 1024-row pages and a probe
    // key needs ~one
    val admittedBytes = pr.rowFiltered.map { fk =>
      val d = new java.io.File(fk.path.stripPrefix("file:"))
      if (d.isDirectory)
        d.listFiles().filter(f => !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).map(_.length()).sum
      else d.length()
    }.sum
    assert(bytesRead < admittedBytes,
      s"tier 4 must read less than the admitted files " +
        s"($bytesRead vs $admittedBytes)")

    // an EXPLICITLY split delta stacks on the split compact; the mixed
    // stack reads correctly and the pruned probe crosses both layouts
    store.advance(counts(100L, 300L), 2L, subSplit = 4)
    val stats2 = store.readManifestStats(2L)
    assert(stats2.values.flatten.exists(s =>
      s.name === "seg-2-delta" && s.subSplit === 4))
    val agg2 = occMap(store.readAggregated(2L))
    assert(agg2(200L) === 2L * occOf(200L)) // compact + new delta
    assert(agg2(7L) === occOf(7L))
    val pruned2 = store.readPruned(3L, Seq(200L).toDF("shingle"))
    assert(occMap(graft.ops.Dedup.aggregateOccurrences(
      pruned2.filter(col("shingle") === 200L))) === Map(200L -> 6L))
    // SPARSE split bucket: a probe key routing to a sub-file no row ever
    // landed in must be PRUNED from the path list (sub-presence mask),
    // not handed to the reader as a nonexistent directory — a 1-row
    // split delta populates exactly one sub of its bucket
    store.advance(Seq((100L, 1L)).toDF("shingle", "occ"), 3L, subSplit = 4)
    val b100 = spark.range(1).select(
        pmod(lit(100L), lit(B.toLong)).cast("int"),
        pmod(xxhash64(lit(100L)), lit(4L)).cast("int"))
      .collect()(0)
    val (bOf100, sOf100) = (b100.getInt(0), b100.getInt(1))
    val kSparse = spark.range(1000, 2000)
      .filter(pmod(col("id"), lit(B.toLong)).cast("int") === bOf100 &&
        pmod(xxhash64(col("id")), lit(4L)).cast("int") =!= sOf100)
      .select(col("id")).orderBy("id").limit(1).collect()(0).getLong(0)
    val prSparse =
      store.probeRead(4L, Seq(kSparse).toDF("shingle")) // must not throw
    assert(occMap(graft.ops.Dedup.aggregateOccurrences(
      prSparse.frame.filter(col("shingle") === kSparse)))
      === Map(kSparse -> agg2(kSparse)),
      "sparse-sub pruning must keep the key's other segments readable")
    assert(!prSparse.rowFiltered.exists(_.path.contains("seg-3-delta")) &&
      !prSparse.wholePaths.exists(_.contains("seg-3-delta")),
      "the 1-row split delta's only sub is a different one — pruned")
    // bit-63 edge: a sparse subSplit=64 bucket populating sb=63 makes
    // the mask NEGATIVE — the all-present sentinel must be exactly -1,
    // not any negative value, or this bucket's unwritten subs crash the
    // probe with a nonexistent path (r13 review)
    val k63 = spark.range(0, 100000)
      .filter(pmod(xxhash64(col("id")), lit(64L)).cast("int") === 63)
      .select(col("id")).orderBy("id").limit(1).collect()(0).getLong(0)
    store.advance(Seq((k63, 1L)).toDF("shingle", "occ"), 4L, subSplit = 64)
    val bK63 = math.floorMod(k63, B.toLong).toInt
    val kOther = spark.range(0, 100000)
      .filter(pmod(col("id"), lit(B.toLong)).cast("int") === bK63 &&
        pmod(xxhash64(col("id")), lit(64L)).cast("int") =!= 63)
      .select(col("id")).orderBy("id").limit(1).collect()(0).getLong(0)
    val p63 = store.probeRead(5L,
      Seq(kOther).toDF("shingle")) // must not throw
    p63.frame.count()
    assert(!p63.rowFiltered.exists(_.path.contains("seg-4-delta")) &&
      !p63.wholePaths.exists(_.contains("seg-4-delta")),
      "the sb=63-only delta holds nothing for this key's sub — pruned")
    // the one-Long mask bounds the explicit knob
    intercept[IllegalArgumentException] {
      store.advance(Seq((1L, 1L)).toDF("shingle", "occ"), 6L,
        subSplit = 65)
    }
    // derive rule unit pins (the write-once granularity policy — r14:
    // target 32768 rows/sub-file, derived splits capped at 16; tier 4's
    // page reads keep probe bytes key-proportional inside the coarser
    // files, so the file-count dial moved without a byte regression)
    assert(OccStateStore.deriveSubSplit(10000L) === 1)
    assert(OccStateStore.deriveSubSplit(65535L) === 1)
    assert(OccStateStore.deriveSubSplit(65536L) === 2)
    assert(OccStateStore.deriveSubSplit(100000L) === 4)
    assert(OccStateStore.deriveSubSplit(1000000000L) === 16)
  }

  test("driver-local micro lane (r15 verdict item 1): the whole streamed " +
    "history — spans AND state — is row-identical between the local lane " +
    "and the gate-disabled distributed lane; probeReadLocal rows == the " +
    "distributed probe frame through sub-split segments on hash-valued " +
    "keys") {
    val rootL = java.nio.file.Files
      .createTempDirectory("graft_span_local_").toString
    val rootD = java.nio.file.Files
      .createTempDirectory("graft_span_dist_").toString
    for ((bt, bid) <- Seq(b0, b1, b2).zipWithIndex) {
      // default gate: these batches are byte- and key-micro → LOCAL lane
      StreamingSpanDedup.processBatch(bt.toDF("doc_id", "text"),
        bid.toLong, "doc_id", "text", s"$rootL/state", s"$rootL/spans",
        n = 5)
      // gate disabled → the distributed lane, same inputs
      StreamingSpanDedup.processBatch(bt.toDF("doc_id", "text"),
        bid.toLong, "doc_id", "text", s"$rootD/state", s"$rootD/spans",
        n = 5, microBatchMaxBytes = Dedup.MicroBatchGateDisabled)
    }
    val spansL = spanRows(spark.read.parquet(s"$rootL/spans"))
    assert(spansL === spanRows(spark.read.parquet(s"$rootD/spans")))
    assert(spansL.nonEmpty, "fixture must emit spans")
    assert(occMap(OccStateStore.open(spark, s"$rootL/state")
      .readAggregated(2L)) ===
      occMap(OccStateStore.open(spark, s"$rootD/state")
        .readAggregated(2L)))

    // probe identity through SUB-SPLIT segments (tier-4 file specs ride
    // the driver loop too): a store whose base opts into sb= files
    val rootP = java.nio.file.Files
      .createTempDirectory("graft_probe_local_").toString
    val storeP = OccStateStore.open(spark, rootP, numBuckets = 16)
    storeP.advance(Dedup.shingleOccurrenceTable(
      (b0 ++ b1).toDF("doc_id", "text"), "text", n = 5), 0L, subSplit = 4)
    val perDoc = Dedup.localShingleDocs(b2.toArray.map(t => (t._1, t._2)), 5)
    val counts = Dedup.localOccCounts(perDoc)
    val keys = counts.keysIterator.toArray :+ 987654321L // one absent key
    val local = storeP.probeReadLocal(1L, keys)
    assert(local.rowFiltered.nonEmpty,
      "fixture must exercise the sharp (sub-file) path")
    val dist = storeP.probeRead(1L, keys)
    assert(local.rows.sorted.toSeq === dist.frame.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    assert(local.rows.nonEmpty, "fixture must find base rows")

    // kernel identity at the API level: incrementalSpansLocal over the
    // locally-probed rows == the distributed prepared tail over the full
    // state read (hash-valued keys, same batch)
    val localSpans = Dedup.incrementalSpansLocal(perDoc, counts,
        local.rows, 5, 2)
      .sortBy(t => (t._1, t._3)).toSeq
    val batch = b2.toDF("doc_id", "text").persist()
    batch.count()
    val (shEx, cnts) = Dedup.prepareIncrementalBatch(batch, "doc_id",
      "text", n = 5)
    val distSpans = spanRows(Dedup.incrementalSpansPrepared(shEx, cnts,
      storeP.readLatestBefore(1L), n = 5))
    assert(localSpans === distSpans)
    shEx.unpersist(); cnts.unpersist(); batch.unpersist()
  }

  test("driver-local gate fallback is EXACT (retires the r15 " +
    "stats-trusting collect): a byte-micro batch with more than " +
    "DriverPlanMaxKeys distinct shingles refuses the local lane, and " +
    "processBatch still serves it correctly through the distributed one") {
    // one doc: > 64k unique tokens (so > DriverPlanMaxKeys distinct
    // 5-gram shingles at well under the 16 MB byte gate) plus a phrase
    // repeated twice so the batch emits a within-batch span
    val repPhrase = "golf hotel india juliett kilo"
    val text = ((0 until 70100).map(i => s"tk$i") :+ repPhrase :+
      "uvw xyz" :+ repPhrase).mkString(" ")
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_fallback_").toString
    val bdf = Seq((7L, text)).toDF("doc_id", "text").persist()
    bdf.count()
    assert(bdf.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(Dedup.MicroBatchMaxBytes), "fixture must stay byte-micro")
    val store = OccStateStore.open(spark, s"$root/state")
    assert(!StreamingSpanDedup.processBatchLocal(bdf, 0L, "doc_id",
      "text", store, s"$root/spans_local", 5, 2, ""),
      "the exact key gate must refuse > DriverPlanMaxKeys")
    bdf.unpersist()
    StreamingSpanDedup.processBatch(Seq((7L, text)).toDF("doc_id", "text"),
      0L, "doc_id", "text", s"$root/state", s"$root/spans", n = 5)
    val got = spanRows(spark.read.parquet(s"$root/spans"))
    assert(got === spanRows(Dedup.repeatedSpans(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text", n = 5)))
    assert(got.nonEmpty, "the repeated phrase must span")
  }
}
