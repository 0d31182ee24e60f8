package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** [[Dedup.shingleHashes]] must be bit-identical to the legacy
  * boilerplate chain `array_distinct(transform(shingles(text, n),
  * xxhash64))` — i.e. the [[Dedup.shingles]] string kernel hashed by
  * Spark's XxHash64 at seed 42, deduped ON THE HASH in first-occurrence
  * order. The byte-buffer assembly (UTF-8 token bytes joined by spaces)
  * must agree with `UTF8String.fromString(shingle)` on every input,
  * including multi-byte UTF-8 and unpaired surrogates. */
class ShingleHashesSpec extends AnyFunSuite {

  private def legacy(text: String, n: Int): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    Dedup.shingles(text, n).foreach { s =>
      val h = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
      if (seen.add(h)) out += h
    }
    out.toArray
  }

  private val rnd = new scala.util.Random(20260815)
  private val alphabets = Seq(
    "abc d  e", // ASCII words + runs of spaces
    "abcdefghijklmnopqrstuvwxyz0123456789 \t\n.,!?-_",
    "éüßñ日本語한국어 ,.", // multi-byte UTF-8
    "a😀b \ud800c" // emoji (surrogate pair) + unpaired surrogate
  )

  private def randText(): String = {
    val a = alphabets(rnd.nextInt(alphabets.length))
    val len = rnd.nextInt(120)
    val sb = new StringBuilder(len)
    for (_ <- 0 until len) sb.append(a.charAt(rnd.nextInt(a.length)))
    sb.toString
  }

  test("bit-identical to the legacy chain on 40k random texts, n in 1..5") {
    for (i <- 0 until 40000) {
      val t = randText()
      val n = 1 + rnd.nextInt(5)
      val fast = Dedup.shingleHashes(t, n)
      val slow = legacy(t, n)
      assert(java.util.Arrays.equals(fast, slow),
        s"mismatch on n=$n text=${t.map(_.toInt).mkString(",")} (case $i)")
    }
  }

  test("edges: null, empty, all-space, fewer tokens than n") {
    for (n <- 1 to 4; t <- Seq(null, "", "   ", "one", "one two", "UPPER case MiX")) {
      assert(java.util.Arrays.equals(
        Dedup.shingleHashes(t, n), legacy(t, n)), s"n=$n t=$t")
    }
  }

  test("distinct is on the hash, first-occurrence order") {
    // repeated shingles collapse to one hash, order of first appearance
    val t = "a b a b a b" // bigrams: "a b","b a","a b","b a","a b" → 2 distinct
    assert(Dedup.shingleHashes(t, 2).length == 2)
    assert(java.util.Arrays.equals(Dedup.shingleHashes(t, 2), legacy(t, 2)))
  }

  /** The pre-r9 string form of [[Dedup.hashedShingles]], verbatim —
    * distinct on the shingle TEXT through HashSet[String]. */
  private def legacyHashed(text: String, n: Int): Array[Long] = {
    val sh = Dedup.shingles(text, n)
    val seen = new java.util.HashSet[String](sh.length * 2)
    val out = new Array[Long](sh.length)
    var k = 0
    sh.foreach { s =>
      if (seen.add(s)) {
        out(k) = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
        k += 1
      }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  test("hashedShingles (distinct-on-text twin): bit-identical to the " +
    "legacy HashSet[String] form on 40k random texts, n in 1..5") {
    for (i <- 0 until 40000) {
      val t = randText()
      val n = 1 + rnd.nextInt(5)
      assert(java.util.Arrays.equals(
        Dedup.hashedShingles(t, n), legacyHashed(t, n)),
        s"mismatch on n=$n text=${t.map(_.toInt).mkString(",")} (case $i)")
    }
    for (n <- 1 to 4; t <- Seq(null, "", "   ", "one", "a b a b a b")) {
      assert(java.util.Arrays.equals(
        Dedup.hashedShingles(t, n), legacyHashed(t, n)), s"n=$n t=$t")
    }
  }
}
