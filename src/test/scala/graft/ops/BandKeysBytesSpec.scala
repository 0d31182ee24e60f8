package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The byte-level window assembly inside [[Dedup.bandKeys]] must digest
  * EXACTLY the bytes the legacy string form digested — same shingle
  * windows, same UTF-8 encoding — on every input, including multi-byte
  * UTF-8, unpaired surrogates, null, and short texts. */
class BandKeysBytesSpec extends AnyFunSuite {

  /** The legacy string-based kernel, verbatim (the committed pre-r9 form). */
  private def legacy(text: String, n: Int, bands: Int, rows: Int): Seq[String] = {
    val sh = Dedup.shingles(text, n)
    val sigs = Array.fill(bands * rows)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    sh.foreach { s =>
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) | 1L
      var j = 0
      while (j < sigs.length) {
        val v = (h1 + j * h2) % 4294967296L
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
    }
    (0 until bands).map(b => (b.toString +: (0 until rows).map(r =>
      sigs(b * rows + r).toString)).mkString("|"))
  }

  private val rnd = new scala.util.Random(20260815)
  private val alphabets = Seq(
    "abc d  e",
    "abcdefghijklmnopqrstuvwxyz0123456789 \t\n.,!?-_",
    "éüßñ日本語한국어 ,.",
    "a😀b \ud800c")

  private def randText(): String = {
    val a = alphabets(rnd.nextInt(alphabets.length))
    val len = rnd.nextInt(120)
    val sb = new StringBuilder(len)
    for (_ <- 0 until len) sb.append(a.charAt(rnd.nextInt(a.length)))
    sb.toString
  }

  test("bit-identical to the legacy string kernel on 20k random texts") {
    for (i <- 0 until 20000) {
      val t = randText()
      val n = 1 + rnd.nextInt(5)
      assert(Dedup.bandKeys(t, n, 4, 2) == legacy(t, n, 4, 2),
        s"mismatch on n=$n text=${t.map(_.toInt).mkString(",")} (case $i)")
    }
  }

  test("edges: null, empty, all-space, fewer tokens than n, demo params") {
    for (t <- Seq(null, "", "   ", "one", "one two three")) {
      assert(Dedup.bandKeys(t, 3, 8, 4) == legacy(t, 3, 8, 4), s"t=$t")
    }
  }
}
