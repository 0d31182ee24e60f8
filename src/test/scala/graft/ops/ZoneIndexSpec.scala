package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The zone-sidecar pruning primitive. The invariant that matters is
  * NO FALSE NEGATIVES: any (group, bucket) actually containing a probe
  * key must survive [[ZoneIndex.hitPairs]] — a miss would silently drop
  * rows from whatever read the caller prunes. Pinned property-style over
  * random relations and probes, plus the cap/range edges. */
class ZoneIndexSpec extends SparkSpec {
  import spark.implicits._

  test("collectZoneGroups: ONE job over many sidecars == per-group " +
    "collectZones; bloom budget degrades to count/min-max, never drops " +
    "a group") {
    val b = 4
    val root = java.nio.file.Files
      .createTempDirectory("graft_zone_groups_").toString
    val groupsOnDisk = Seq("10", "9", "2").map { g =>
      val keys = (1L to 200L).map(k => k * 31L + g.toLong)
      ZoneIndex.save(ZoneIndex.build(keys.toDF("k"), "k", b),
        s"$root/batch_id=$g/_zones")
      g -> keys
    }.toMap
    val paths = groupsOnDisk.keys.toSeq.sorted.map(g =>
      s"$root/batch_id=$g/_zones")
    val one = ZoneIndex.collectZoneGroups(spark, paths,
      "batch_id=([^/]+)/_zones", None)
    assert(one.keySet === groupsOnDisk.keySet)
    groupsOnDisk.keys.foreach { g =>
      val per = ZoneIndex.collectZones(
        ZoneIndex.load(spark, s"$root/batch_id=$g/_zones"), (0 until b).toSet)
      assert(one(g).view.mapValues(z => (z.cnt, z.kmin, z.kmax)).toMap ===
        per.view.mapValues(z => (z.cnt, z.kmin, z.kmax)).toMap)
      assert(one(g).values.forall(_.bloom != null))
    }
    // budget exhausted: every group still present, blooms degrade to
    // null — and a probe key its group actually contains still survives
    // hitPairs on range alone (never-false-negative under degradation)
    val broke = ZoneIndex.collectZoneGroups(spark, paths,
      "batch_id=([^/]+)/_zones", None, bloomBudgetBytes = 0L)
    assert(broke.keySet === groupsOnDisk.keySet)
    assert(broke.values.flatMap(_.values).forall(_.bloom == null))
    val probe = groupsOnDisk("9").take(5).toDF("k")
    val hits = ZoneIndex.hitPairs(broke, probe, "k", b)
    assert(groupsOnDisk("9").take(5)
      .map(k => ("9", math.floorMod(k, b).toInt)).toSet.subsetOf(hits))
    // numeric-aware budget order: with budget for ONE group's blooms,
    // the highest NUMERIC group id (10, not lexicographic "9") keeps its
    // blooms
    val oneGroupBytes = one("10").values.map(_.bloom.length).sum.toLong
    val partial = ZoneIndex.collectZoneGroups(spark, paths,
      "batch_id=([^/]+)/_zones", None, bloomBudgetBytes = oneGroupBytes)
    assert(partial("10").values.forall(_.bloom != null))
    assert(partial("2").values.forall(_.bloom == null))
  }

  test("build: per-bucket cnt/min/max exact; save/load roundtrip; " +
    "bloom present under the cap, null past it") {
    val b = 8
    val keys = (1L to 3000L).map(_ * 7919L) // spread over buckets
    val df = keys.toDF("k")
    val zones = ZoneIndex.build(df, "k", b)
    val rows = zones.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.isNullAt(4))).toMap
    // exact stats per bucket vs a hand rollup
    val expect = keys.groupBy(k => math.floorMod(k, b).toInt)
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (bk, ks) =>
      val (cnt, kmin, kmax, bloomNull) = rows(bk)
      assert(cnt === ks.size.toLong)
      assert(kmin === ks.min && kmax === ks.max)
      assert(!bloomNull, s"bucket $bk under the cap must carry a bloom")
    }
    // roundtrip
    val path = java.nio.file.Files
      .createTempDirectory("graft_zones_").toString
    ZoneIndex.save(zones, path)
    val loaded = ZoneIndex.collectZones(
      ZoneIndex.load(spark, path), rows.keySet)
    assert(loaded.view.mapValues(z => (z.cnt, z.kmin, z.kmax)).toMap ===
      rows.view.mapValues(t => (t._1, t._2, t._3)).toMap)
    // past the cap: bloom null (kept, never pruned)
    val big = ZoneIndex.build((1L to 3000L).toDF("k"), "k",
      numBuckets = 1, maxBloomKeys = 100)
    assert(big.collect()(0).isNullAt(4))
  }

  test("property: NO false negatives — every (group, bucket) holding a " +
    "probe key survives hitPairs, across random relations and probes") {
    val rng = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val b = Seq(4, 16, 64)(trial - 1)
      // two groups with overlapping but distinct key sets
      val g1 = Seq.fill(400)(rng.nextLong())
      val g2 = Seq.fill(300)(rng.nextLong())
      val zones = Map(
        "g1" -> ZoneIndex.collectZones(
          ZoneIndex.build(g1.toDF("k"), "k", b), (0 until b).toSet),
        "g2" -> ZoneIndex.collectZones(
          ZoneIndex.build(g2.toDF("k"), "k", b), (0 until b).toSet))
      // probe: some present keys, some absent
      val probe = (g1.take(50) ++ g2.take(50) ++
        Seq.fill(100)(rng.nextLong())).distinct
      val hits = ZoneIndex.hitPairs(zones, probe.toDF("k"), "k", b)
      // soundness: every truly-present (group, bucket) is in hits
      def trueHits(name: String, ks: Seq[Long]) = {
        val s = ks.toSet
        probe.filter(s.contains)
          .map(k => (name, math.floorMod(k, b).toInt)).toSet
      }
      val must = trueHits("g1", g1) ++ trueHits("g2", g2)
      assert(must.subsetOf(hits),
        s"trial $trial: missing ${(must -- hits).take(3)}")
      // effectiveness (not soundness): absent keys mostly prune — with
      // 1% fpp blooms the false-positive pairs stay a small minority
      assert(hits.size <= must.size + 40, s"trial $trial: ${hits.size}")
    }
  }

  test("build is a PARALLEL partial fold (r12 verdict): multi-partition " +
    "input == 1-partition input byte-for-byte (blooms included), and the " +
    "numBuckets=1 fold stage runs one task per input partition, not one " +
    "total") {
    val keys = (1L to 5000L).map(_ * 104729L)
    def zonesOf(z: org.apache.spark.sql.DataFrame) = z.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getAs[Array[Byte]](4).toSeq))
      .toMap
    for (b <- Seq(1, 4)) {
      val par = zonesOf(ZoneIndex.build(keys.toDF("k").repartition(8),
        "k", b))
      val one = zonesOf(ZoneIndex.build(keys.toDF("k").coalesce(1),
        "k", b))
      assert(par === one, s"numBuckets=$b: parallel fold must equal the " +
        "sequential one, bloom bytes included (order-independent OR of " +
        "bit sets)")
    }
    // cap behavior across partition merges: total over the cap → null,
    // even though each PARTIAL was under it
    val capped = ZoneIndex.build(keys.toDF("k").repartition(8), "k",
      numBuckets = 1, maxBloomKeys = 1000)
    assert(capped.collect()(0).isNullAt(4))
    // parallelism pin: the numBuckets=1 build's fold stage must run one
    // task per input partition (the old constant-key repartition routed
    // the whole frame through ONE task — a corpus-mass sidecar build
    // serialized)
    val sc = spark.sparkContext
    sc.setJobGroup("zone_par_pin", "zone build parallelism pin")
    try ZoneIndex.build(keys.toDF("k").repartition(8), "k", 1).collect()
    finally sc.clearJobGroup()
    val maxTasks = sc.statusTracker.getJobIdsForGroup("zone_par_pin")
      .flatMap(id => sc.statusTracker.getJobInfo(id).toList
        .flatMap(_.stageIds()))
      .flatMap(sid => sc.statusTracker.getStageInfo(sid).toList)
      .map(_.numTasks()).max
    assert(maxTasks >= 8,
      s"fold stage ran $maxTasks tasks — the partial fold must " +
        "parallelize over input partitions at numBuckets=1")
  }

  test("range rule: keys outside [kmin, kmax] prune even without a bloom") {
    val zones = Map("g" -> ZoneIndex.collectZones(
      ZoneIndex.build(Seq(100L, 200L, 300L).toDF("k"), "k",
        numBuckets = 1, maxBloomKeys = 1), Set(0)))
    assert(zones("g")(0).bloom === null)
    // probe entirely below the range: pruned
    assert(ZoneIndex.hitPairs(zones, Seq(1L, 50L).toDF("k"), "k", 1)
      === Set.empty)
    // probe inside the range with no bloom: kept (the safe direction)
    assert(ZoneIndex.hitPairs(zones, Seq(150L).toDF("k"), "k", 1)
      === Set(("g", 0)))
  }

  test("BloomCache hit verifies CONTENT: same (ns, segment, bucket) key " +
    "with different serialized bytes replaces the entry instead of " +
    "serving the stale one-sided filter (r14 ADVICE item 1 — a same-path " +
    "store recreate reuses deterministic segment names, and a stale " +
    "bloom's false negative silently drops state rows); dropNamespace " +
    "frees a root's entries") {
    import org.apache.spark.util.sketch.BloomFilter
    def ser(keys: Seq[Long]): Array[Byte] = {
      val bf = BloomFilter.create(keys.length.toLong, ZoneIndex.BloomFpp)
      keys.foreach(bf.putLong)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out); out.toByteArray
    }
    def roundtrip(bf: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out); out.toByteArray
    }
    val gen1 = ser(Seq(1L, 2L, 3L))
    val gen2 = ser(Seq(100L, 200L)) // the recreated store's bloom
    val ns = s"zis-stale-${System.nanoTime()}"
    ZoneIndex.BloomCache.get(ns, "seg-1-delta", 0, gen1)
    // the old store is deleted and recreated at the same path; the
    // deterministic segment name collides — the hit must detect the
    // content change, re-deserialize, and serve gen2's filter
    val missesBefore = ZoneIndex.BloomCache.missCount
    val served = ZoneIndex.BloomCache.get(ns, "seg-1-delta", 0, gen2)
    assert(ZoneIndex.BloomCache.missCount === missesBefore + 1,
      "a content mismatch must re-deserialize, not serve the stale bloom")
    assert(java.util.Arrays.equals(roundtrip(served), gen2))
    // reference fast path (the steady state: memoized broadcasts pass
    // the same array instance): a hit, zero misses
    val m2 = ZoneIndex.BloomCache.missCount
    ZoneIndex.BloomCache.get(ns, "seg-1-delta", 0, gen2)
    assert(ZoneIndex.BloomCache.missCount === m2)
    // equal content in a DIFFERENT array instance (a fresh broadcast of
    // the same immutable sidecar): still a hit via the equals fallback
    ZoneIndex.BloomCache.get(ns, "seg-1-delta", 0, gen2.clone)
    assert(ZoneIndex.BloomCache.missCount === m2)
    // dropNamespace evicts: the next get deserializes again
    ZoneIndex.BloomCache.dropNamespace(ns)
    ZoneIndex.BloomCache.get(ns, "seg-1-delta", 0, gen2)
    assert(ZoneIndex.BloomCache.missCount === m2 + 1)
  }
}
