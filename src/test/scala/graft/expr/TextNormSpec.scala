package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** The ASCII fast path of [[TextNorm.normalize]] must be bit-identical
  * to the general six-scan Unicode path on every input that takes it —
  * and the dispatch must route any non-ASCII char to the general path. */
class TextNormSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260815)

  private def randAscii(n: Int): String = {
    val sb = new StringBuilder(n)
    for (_ <- 0 until n) sb.append((rnd.nextInt(0x80)).toChar) // all ASCII incl. controls
    sb.toString
  }

  test("ASCII fast path == general path on 100k random ASCII strings") {
    for (i <- 0 until 100000) {
      val s = randAscii(rnd.nextInt(64))
      val fast = TextNorm.normalize(s)
      val slow = TextNorm.normalizeGeneral(s)
      assert(fast == slow, s"mismatch on ${s.map(_.toInt).mkString(",")}: " +
        s"fast=$fast slow=$slow (case $i)")
    }
  }

  test("dispatch: any non-ASCII char routes to the general path (spot-equivalence)") {
    // mixed strings still agree overall because normalize() RETURNS the
    // general path's output verbatim for them; spot-check the boundary
    val mixed = Seq("Café", "ábc", "ﬁn—x", "é", "xy",
      "ascii then é end", "é then ascii", "😀 emoji",
      "a" * 100 + "É" + "b" * 100)
    for (s <- mixed)
      assert(TextNorm.normalize(s) == TextNorm.normalizeGeneral(s))
  }

  test("edges: empty, null, all-punct, leading/trailing runs, case fold") {
    assert(TextNorm.normalize("") == "")
    assert(TextNorm.normalize(null) == null)
    assert(TextNorm.normalize("!!! ??? ---") == "")
    assert(TextNorm.normalize("  Hello,  WORLD!  ") == "hello world")
    assert(TextNorm.normalize("A1!B2") == "a1 b2")
    assert(TextNorm.normalize("\t\na") == "a")
    assert(TextNorm.normalize("a\t\n") == "a")
  }
}
