package graft.ops

import graft.SparkSpec
import graft.sink.TarShards
import org.apache.spark.sql.functions._

/** Seeded randomized property checks for the round's kernels — invariants
  * that must hold on ARBITRARY input, not just the curated vectors. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  test("packSequences: offsets bounded, sequences monotone, fold-consistent") {
    val maxTokens = 64L
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox")
    val docs = (0L until 300L).map { id =>
      (id, Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }
    val out = TextAnalysis.packSequences(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxTokens, docsPerShard = 50)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 300)
    out.foreach { case (_, _, _, _, off) =>
      assert(off >= 0 && off < maxTokens, s"offset $off out of range")
    }
    // replay the greedy fold per shard and compare every assignment
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, seq, off) =>
        assert(seq == cum / maxTokens, s"doc $id seq $seq != ${cum / maxTokens}")
        assert(off == cum % maxTokens, s"doc $id off $off != ${cum % maxTokens}")
        cum += n
      }
    }
  }

  test("tar: arbitrary printable names and binary payloads round-trip") {
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(12)
      val names = scala.collection.mutable.LinkedHashSet.empty[String]
      while (names.size < n) {
        val candidate = (1 to (1 + rnd.nextInt(40)))
          .map(_ => (33 + rnd.nextInt(94)).toChar).mkString
          .replace("/", "_") // flat archive: no directories
        names += candidate
      }
      val entries = names.toSeq.map { name =>
        val b = new Array[Byte](rnd.nextInt(1500))
        rnd.nextBytes(b)
        name -> b
      }
      val back = TarShards.tarEntries(TarShards.tarBytes(entries)).get
      assert(back.map(_._1) == entries.map(_._1))
      back.zip(entries).foreach { case ((_, b), (nm, exp)) =>
        assert(b.sameElements(exp), s"payload differs for $nm")
      }
    }
  }

  test("bandKeys: deterministic, right arity, parseable signatures") {
    for (_ <- 1 to 50) {
      val text = (1 to rnd.nextInt(60))
        .map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
        .mkString(" ")
      val (bands, rows) = (1 + rnd.nextInt(6), 1 + rnd.nextInt(3))
      val k1 = Dedup.bandKeys(text, 3, bands, rows)
      val k2 = Dedup.bandKeys(text, 3, bands, rows)
      assert(k1 == k2, "non-deterministic band keys")
      assert(k1.length == bands)
      k1.zipWithIndex.foreach { case (key, b) =>
        val parts = key.split("\\|")
        assert(parts.length == rows + 1 && parts(0) == b.toString, key)
        parts.drop(1).foreach { sig =>
          val v = sig.toLong
          assert(v >= 0 && v < 4294967296L, s"sig $v out of 32-bit range")
        }
      }
    }
  }

  test("htmlToTextCol on tag-free text == whitespace-collapsed text") {
    val texts = (1 to 40).map { _ =>
      (1 to rnd.nextInt(30)).map(_ =>
        if (rnd.nextBoolean()) "word" + rnd.nextInt(100)
        else Seq(" ", "\n", "\t", "  ")(rnd.nextInt(4))).mkString(" ")
    }
    val out = texts.toDF("t")
      .select(TextAnalysis.htmlToTextCol(col("t")).as("x"), col("t"))
      .collect()
    out.foreach { r =>
      val expected = r.getString(1).replaceAll("\\s+", " ").trim
      assert(r.getString(0) == expected, s"'${r.getString(0)}' != '$expected'")
    }
  }
}
