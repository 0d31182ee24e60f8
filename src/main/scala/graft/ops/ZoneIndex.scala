package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-bucket ZONE metadata for any LONG-keyed, `pmod(key, numBuckets)`-
  * bucketed parquet relation: row count, key min/max, and a small
  * per-bucket Bloom filter — the shared primitive behind file-level
  * pruning (r11 verdict stretch item): "which bucket files can this key
  * batch possibly hit?" answered from a sidecar orders of magnitude
  * smaller than the relation, with NO FALSE NEGATIVES (ZoneIndexSpec
  * pins it property-style).
  *
  * Consumers:
  *  - [[graft.streaming.OccStateStore]]: every segment writes a zone
  *    sidecar; the streaming probe prunes the stacked segment files of
  *    its touched buckets down to the ones whose zones a batch key might
  *    hit ([[graft.streaming.OccStateStore.readPruned]]).
  *  - [[graft.streaming.StreamingSpanDedup]]'s positions index: each
  *    batch's `batch_id=` partition carries a one-row zone sidecar
  *    (numBuckets = 1 — a bloom over the whole partition's shingles), so
  *    the retroactive sweep's crossed-key restriction
  *    (`positionsPrunedBy`) opens only the batch partitions a crossed
  *    key might hit instead of scanning the accumulated index.
  *
  * Pruning soundness (the only invariant that matters — a false negative
  * silently drops rows):
  *  - bucket absent from the zones → the relation holds NO rows for it
  *    (zones are built from the complete relation) → prune, exact;
  *  - `kmin`/`kmax`: a key outside the range cannot match → prune, exact;
  *  - Bloom miss → the key is definitely absent (Bloom's one-sided
  *    guarantee) → prune;
  *  - Bloom ABSENT (bucket bigger than the size cap) → keep — the
  *    never-wrong direction. The cap exists because blooms are sized
  *    ~9.6 bits/key (fpp [[BloomFpp]]): micro-batch-sized buckets get
  *    tiny filters, corpus-mass buckets (where a batch key almost surely
  *    hits anyway) aren't worth megabytes of sidecar. The honest regime
  *    statement: zone pruning bites on SMALL segments (stacked streaming
  *    deltas, sparse index buckets), not on a compacted corpus-mass
  *    bucket — that one is pruned by the bucket SET, not the zone.
  */
object ZoneIndex {

  /** Bloom false-positive rate: 1%, which Spark's BloomFilter realizes at
    * −ln(0.01)/ln²2 ≈ 9.6 bits/key — the figure every sidecar-size budget
    * below is stated in. (The first cut passed 2⁻¹⁰ as the fpp, which
    * allocates ~14.4 bits/key — every stated size was ~44% understated;
    * a false positive only costs reading one extra file, so 1% is the
    * right trade.) */
  final val BloomFpp = 0.01

  /** Default bound on keys per bloom — buckets past it get NO bloom
    * (kept, never pruned — the safe direction): 6.5k keys ≈ 8 KB of
    * filter, the many-buckets-per-segment sidecar shape. A consumer
    * storing ONE zone row per relation (numBuckets = 1 — the streaming
    * positions partitions) passes a bigger cap; the sidecar is per-file
    * there, not per-bucket-per-segment. */
  final val MaxBloomKeys = 6500

  /** One bucket's zone row, as collected for pruning. `bloom` is null
    * past the build's bloom-key cap. */
  final case class Zone(cnt: Long, kmin: Long, kmax: Long,
                        bloom: Array[Byte])

  /** Per-partition zone tester — the ONE implementation of the
    * one-sided pruning rules (object doc), shared by [[hitPairs]] and
    * [[graft.streaming.OccStateStore]]'s probe-planning job (r13
    * review: two hand-copies of the kmin/kmax + bloom rules would
    * silently desynchronize probe pruning from sweep pruning at the
    * next rule change). Construct one per task. With `cacheNamespace`
    * null, blooms deserialize once per (group, bucket) per INSTANCE
    * (the r13 behavior — right for one-shot consumers over ad-hoc
    * groups); a non-null namespace routes through the JVM-wide
    * [[BloomCache]] instead, so a high-cadence serving deployment
    * deserializes each immutable sidecar's bloom once per EXECUTOR, not
    * once per task per micro-batch (r13 verdict item 2). The caller
    * owns the immutability contract: (namespace, group, bucket) must
    * identify one bloom forever — segment/chunk names are write-once
    * (or deterministically replay-rewritten) in both stores that pass
    * one. */
  final class ZoneProbe(cacheNamespace: String = null) {
    private val blooms =
      new scala.collection.mutable.HashMap[(String, Int), BloomFilter]
    /** true iff key `k` MIGHT be present in `name`'s bucket `b` with
      * zone `z` — never a false negative. */
    def mightHit(name: String, b: Int, z: Zone, k: Long): Boolean =
      k >= z.kmin && k <= z.kmax && (z.bloom == null || {
        val bf =
          if (cacheNamespace == null)
            blooms.getOrElseUpdate((name, b), BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(z.bloom)))
          else BloomCache.get(cacheNamespace, name, b, z.bloom)
        bf.mightContainLong(k)
      })
  }

  /** JVM-wide (= per-executor) deserialized-bloom LRU, keyed
    * (namespace, group, bucket) and bounded by serialized bloom bytes —
    * the read twin of the store's driver-side artifact memo. Reads on a
    * cached [[BloomFilter]] are safe concurrently (pure bit-array
    * lookups); the map itself synchronizes. `missCount` instruments
    * deserializations for the one-per-JVM spec pin.
    *
    * A hit VERIFIES the caller's serialized bytes against the cached
    * entry's (r14 ADVICE item 1: a same-path store delete+recreate reuses
    * deterministic segment names, so a key collision across store
    * generations could serve the DELETED store's bloom — a one-sided
    * filter gone stale yields FALSE NEGATIVES, silently dropping state
    * rows from the pruned read). The check is O(1) in the steady state:
    * the zone maps ship via per-JVM memoized broadcasts
    * ([[graft.streaming.OccStateStore.Memo.zonesBc]]), so every task in
    * an executor passes the SAME `Array[Byte]` instance and the `eq`
    * fast path short-circuits; only a new broadcast of the same key
    * (fresh `hitPairs` call, recreated store) pays one `Arrays.equals`,
    * and a content mismatch REPLACES the entry — correctness never
    * depends on an invalidation message reaching the executor. */
  private[graft] object BloomCache {
    private val MaxBytes = 256L << 20
    private val entries =
      new java.util.LinkedHashMap[(String, String, Int),
        (BloomFilter, Array[Byte])](64, 0.75f, true)
    private var bytes = 0L
    private val misses = new java.util.concurrent.atomic.LongAdder

    def missCount: Long = misses.sum()

    // an entry retains BOTH the deserialized filter (~ser.length of bit
    // array) and the verification bytes — account 2× so the budget
    // bounds the real footprint (r15 review)
    private def entryBytes(ser: Array[Byte]): Long = 2L * ser.length

    def get(ns: String, name: String, b: Int,
            ser: Array[Byte]): BloomFilter = synchronized {
      val k = (ns, name, b)
      val hit = entries.get(k)
      if (hit != null &&
          ((hit._2 eq ser) || java.util.Arrays.equals(hit._2, ser)))
        hit._1
      else {
        if (hit != null) { bytes -= entryBytes(hit._2); entries.remove(k) }
        misses.increment()
        val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(ser))
        entries.put(k, (bf, ser))
        bytes += entryBytes(ser)
        val it = entries.entrySet().iterator()
        while (bytes > MaxBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != k) { bytes -= entryBytes(e.getValue._2); it.remove() }
        }
        bf
      }
    }

    /** Drop every entry under `ns` — called by the store-side memo's
      * root invalidation ([[graft.streaming.OccStateStore.Memo.dropAll]])
      * so a same-JVM recreate also frees the old generation's bytes
      * immediately (the content check above is the correctness guard;
      * this is hygiene). */
    def dropNamespace(ns: String): Unit = synchronized {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == ns) {
          bytes -= entryBytes(e.getValue._2)
          it.remove()
        }
      }
    }
  }

  /** Build the zone rows for `df`'s `keyCol` under `numBuckets` pmod
    * buckets: (b, cnt, kmin, kmax, bloom). PARTIAL FOLD, no re-exchange
    * of the keys (r12 verdict: the first cut `repartition(col("b"))`ed —
    * at `numBuckets = 1`, the streaming positions sidecars' shape, a
    * constant bucket value routed the WHOLE frame through one task, so a
    * bulk batch serialized a corpus-mass distinct to build its sidecar):
    * each input partition folds its rows into per-bucket partials
    * (cnt, min, max, ≤ maxBloomKeys buffered keys) in place, and only
    * the partials — bucket-count-bounded, never row-count-bounded —
    * shuffle to merge. The final bloom is built from the merged key
    * buffer, so the bytes are IDENTICAL to a single-task fold (a Bloom
    * filter is an OR of per-key bit sets — insertion order can't show;
    * ZoneIndexSpec pins the parallel == 1-partition equality). */
  def build(df: DataFrame, keyCol: String, numBuckets: Int,
            maxBloomKeys: Int = MaxBloomKeys): DataFrame = {
    require(numBuckets >= 1, s"need numBuckets >= 1, got $numBuckets")
    require(maxBloomKeys >= 1, s"need maxBloomKeys >= 1, got $maxBloomKeys")
    val spark = df.sparkSession
    import spark.implicits._
    // partial: (cnt, kmin, kmax, keys-or-null) — keys drop to null the
    // moment a partial (or a merge) exceeds the bloom cap, the same
    // final null-ness as one sequential fold (null iff total cnt > cap)
    df.select(
        pmod(col(keyCol), lit(numBuckets.toLong)).cast("int").as("b"),
        col(keyCol).cast("long").as("k"))
      .as[(Int, Long)]
      .rdd
      .mapPartitions { it =>
        final class St {
          var cnt = 0L
          var kmin = Long.MaxValue
          var kmax = Long.MinValue
          var buf: scala.collection.mutable.ArrayBuffer[Long] =
            new scala.collection.mutable.ArrayBuffer[Long](64)
        }
        val m = new scala.collection.mutable.HashMap[Int, St]
        it.foreach { case (b, k) =>
          val st = m.getOrElseUpdate(b, new St)
          st.cnt += 1
          if (k < st.kmin) st.kmin = k
          if (k > st.kmax) st.kmax = k
          if (st.buf != null) {
            if (st.cnt > maxBloomKeys) st.buf = null
            else st.buf += k
          }
        }
        m.iterator.map { case (b, st) =>
          (b, (st.cnt, st.kmin, st.kmax,
            if (st.buf == null) null else st.buf.toArray))
        }
      }
      .reduceByKey { (x, y) =>
        val keys: Array[Long] =
          if (x._4 == null || y._4 == null ||
            x._4.length + y._4.length > maxBloomKeys) null
          else x._4 ++ y._4
        (x._1 + y._1, math.min(x._2, y._2), math.max(x._3, y._3), keys)
      }
      .map { case (b, (cnt, kmin, kmax, keys)) =>
        val bloom: Array[Byte] =
          if (keys == null) null
          else {
            val bf = BloomFilter.create(keys.length.max(1).toLong, BloomFpp)
            keys.foreach(bf.putLong)
            val out = new java.io.ByteArrayOutputStream()
            bf.writeTo(out)
            out.toByteArray
          }
        (b, cnt, kmin, kmax, bloom)
      }
      .toDF("b", "cnt", "kmin", "kmax", "bloom")
  }

  def save(zones: DataFrame, path: String): Unit =
    zones.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Collect the zones of `buckets` into the pruning map (bounded by the
    * bucket set × the bloom cap — the caller's bucket set is its batch's
    * pmod set, always ≤ numBuckets). */
  def collectZones(zones: DataFrame, buckets: Set[Int]): Map[Int, Zone] =
    zones.filter(col("b").isin(buckets.toSeq: _*))
      .select("b", "cnt", "kmin", "kmax", "bloom")
      .collect()
      .map(r => r.getInt(0) -> Zone(r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) null else r.getAs[Array[Byte]](4)))
      .toMap

  /** Collect MANY groups' zone sidecars in one pass: `paths` are the
    * `_zones` parquet dirs, `groupRegex` extracts each row's group key
    * from its file path (`input_file_name`), and `buckets` (when set)
    * restricts to the caller's touched set. One sweep-wide call replaces
    * the per-group read+collect loop that cost a scheduler round-trip
    * PER sidecar — at a 10,000-partition positions index that loop was
    * minutes of driver-bound latency per sweep.
    *
    * `bloomBudgetBytes` bounds the bloom bytes this call materializes —
    * ON THE DRIVER as well as in the later broadcast (r12 advice: the
    * first cut collected every group's bloom bytes and only then
    * trimmed, so the driver spiked by the full sidecar bloom mass before
    * the budget applied). TWO PHASES: a stats-only job collects
    * (group, bucket, cnt, kmin, kmax, bloom LENGTH) — no bloom bytes on
    * the wire — the driver admits blooms in DETERMINISTIC recency order
    * (the group key's LAST run of digits, descending — recent
    * batches/chunks first, the partitions a fresh crossed key most
    * plausibly prunes; then name, then bucket) as a PREFIX of that order
    * until the first bloom that does not fit, and a second job fetches
    * ONLY the admitted blooms. Zones past the cut keep count/min-max
    * pruning with a null bloom — the safe (never-false-negative)
    * degradation, bounding both driver and broadcast bytes over an
    * unboundedly growing stream. */
  def collectZoneGroups(spark: SparkSession, paths: Seq[String],
                        groupRegex: String, buckets: Option[Set[Int]],
                        bloomBudgetBytes: Long = 256L << 20)
      : Map[String, Map[Int, Zone]] = {
    if (paths.isEmpty) return Map.empty
    def rows = {
      var r = spark.read.parquet(paths: _*)
        .select(regexp_extract(input_file_name(), groupRegex, 1).as("g"),
          col("b"), col("cnt"), col("kmin"), col("kmax"), col("bloom"))
      buckets.foreach(bs => r = r.filter(col("b").isin(bs.toSeq: _*)))
      r
    }
    // phase 1: stats + bloom LENGTH only (−1 = no bloom)
    val stats = rows
      .select(col("g"), col("b"), col("cnt"), col("kmin"), col("kmax"),
        when(col("bloom").isNull, lit(-1)).otherwise(length(col("bloom")))
          .as("bl"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        (r.getLong(2), r.getLong(3), r.getLong(4)), r.getInt(5)))
    // recency order: the group key's LAST run of digits, descending —
    // "batch_id=9" must not beat "batch_id=10", and OccStateStore keys
    // like "seg-12-delta" carry their number mid-key, so take the last
    // digit RUN, not a trailing-anchored match (r12 advice: the `$`
    // anchor never matched `-delta`/`-compact` suffixed keys, silently
    // degrading their order to lexicographic); digit-less groups follow
    // in stable name order
    val digits = "(\\d+)".r
    def orderKey(g: String): Long =
      digits.findAllIn(g).toSeq.lastOption
        .flatMap(s => scala.util.Try(-s.toLong).toOption)
        .getOrElse(Long.MaxValue)
    val ordered = stats.sortBy { case (g, b, _, _) => (orderKey(g), g, b) }
    // prefix admission: the FIRST bloom that does not fit ends admission
    // (a deterministic prefix of the order — what phase 2's pushed
    // filter can state exactly; skipping it and admitting later smaller
    // blooms could not be expressed as one predicate)
    var budget = bloomBudgetBytes
    var stopped = false
    val admitted = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Int]]()
    ordered.foreach { case (g, b, _, bl) =>
      if (bl >= 0 && !stopped) {
        if (budget >= bl.toLong) {
          budget -= bl.toLong
          admitted.getOrElseUpdate(g,
            new scala.collection.mutable.ArrayBuffer[Int]) += b
        } else stopped = true
      }
    }
    // phase 2: fetch admitted blooms only. The admitted set is a prefix,
    // so it is (whole groups) + at most one partial group as a bucket
    // range — a compact pushable predicate, and the collected bytes are
    // ≤ the budget by construction.
    val bloomsByZone: Map[(String, Int), Array[Byte]] =
      if (admitted.isEmpty) Map.empty
      else {
        val withBloom: Map[String, Int] = stats
          .filter(_._4 >= 0).groupBy(_._1).view.mapValues(_.length).toMap
        val (full, partial) = admitted.toSeq.partition { case (g, bs) =>
          bs.length == withBloom.getOrElse(g, 0)
        }
        val preds = Seq(
          if (full.isEmpty) None
          else Some(col("g").isin(full.map(_._1): _*)),
          partial.headOption.map { case (g, bs) =>
            col("g") === g && col("b") <= bs.max }
        ).flatten
        rows.filter(preds.reduce(_ || _)).filter(col("bloom").isNotNull)
          .select("g", "b", "bloom")
          .collect()
          .map(r => (r.getString(0), r.getInt(1)) ->
            r.getAs[Array[Byte]](2))
          .toMap
      }
    stats.groupBy(_._1).view.mapValues { zs =>
      zs.map { case (g, b, (cnt, kmin, kmax), _) =>
        b -> Zone(cnt, kmin, kmax, bloomsByZone.getOrElse((g, b), null))
      }.toMap
    }.toMap
  }

  /** The (groupName, bucket) pairs a key batch MIGHT hit across several
    * zone groups at once (e.g. one group per stacked segment) — ONE
    * distributed pass over `keys` against the broadcast zone maps, then
    * a bounded distinct collect (≤ Σ |group's buckets|). No false
    * negatives: every rule is one-sided (see the object doc). Buckets
    * absent from a group's map are pruned for that group; a group
    * missing entirely (legacy relation without zones) should simply not
    * be passed — the caller keeps it unpruned. */
  def hitPairs(groups: Map[String, Map[Int, Zone]], keys: DataFrame,
               keyCol: String, numBuckets: Int,
               cacheNamespace: String = null): Set[(String, Int)] = {
    require(numBuckets >= 1, s"need numBuckets >= 1, got $numBuckets")
    if (groups.isEmpty) return Set.empty
    val spark = keys.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(groups)
    val ns = cacheNamespace
    // blooms deserialize once per (group, bucket) per task — or once per
    // JVM when the caller names a BloomCache namespace (see ZoneProbe)
    val hits = keys
      .select(pmod(col(keyCol), lit(numBuckets.toLong)).cast("int").as("b"),
        col(keyCol).cast("long").as("k"))
      .as[(Int, Long)]
      .mapPartitions { it =>
        val gs = bc.value
        val probe = new ZoneProbe(ns)
        val out = new scala.collection.mutable.HashSet[(String, Int)]
        it.foreach { case (b, k) =>
          gs.foreach { case (name, zones) =>
            if (!out.contains((name, b)))
              zones.get(b).foreach { z =>
                if (probe.mightHit(name, b, z, k)) out += ((name, b))
              }
          }
        }
        out.iterator
      }
      .distinct()
      .collect().toSet
    bc.unpersist()
    hits
  }
}
