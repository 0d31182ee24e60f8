package graft.expr

import java.util.regex.Pattern
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** The linear digit-gated scan must be indistinguishable from running
  * java.util.regex on the ORIGINAL lookahead pattern — values, positions,
  * replacement output, both flag profiles — and must stay fast on the
  * single-line worst case that sends the backtracking engine quadratic. */
class DigitGatedSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260814)

  // the three gated patterns of the reference dimension, verbatim
  private val gated = Seq(
    """\b(?=.*\d)[A-Z0-9]{4,15}\b""",
    """\b(?=.*\d)[A-Z0-9\-]{4,15}\b""",
    """\b(?=(?:.*\d){1,})[A-Z0-9]{6,9}\b""")

  test("split recognizes exactly the gated family") {
    gated.foreach(p => assert(DigitGated.split(p).nonEmpty, p))
    assert(DigitGated.split(DigitGated.split(gated.head).get).isEmpty)
    assert(DigitGated.split("""\b\d{3}-\d{2}-\d{4}\b""").isEmpty)
    assert(DigitGated.split("""(?i)(ssn[:\s]*)(\d{3}-\d{2}-\d{4})""").isEmpty)
  }

  private def randomText(): String = {
    val pieces = Seq.newBuilder[String]
    (0 until rnd.nextInt(60)).foreach { _ =>
      pieces += (rnd.nextInt(8) match {
        case 0 => Seq.fill(1 + rnd.nextInt(12))(
          "ABCDEFXYZ0123456789ab-".charAt(rnd.nextInt(22))).mkString
        case 1 => "\n"
        case 2 => rnd.nextInt(100000).toString
        case 3 => "word"
        case 4 => "A1B2C3"
        case 5 => "-"
        case 6 => "NODIGITS"
        case _ => " "
      })
      pieces += (if (rnd.nextInt(4) == 0) "" else " ")
    }
    pieces.result().mkString
  }

  test("findAll == java.util.regex on the original pattern (both flag sets)") {
    val flagSets = Seq(0, Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)
    for (_ <- 0 until 300; p <- gated; flags <- flagSets) {
      val text = randomText()
      val residual = DigitGated.split(p).get
      val ours = DigitGatedKernel.findAll(text, residual, flags)
      val ref = {
        val m = Pattern.compile(p, flags).matcher(text)
        val b = Seq.newBuilder[(Int, Int)]
        while (m.find()) b += ((m.start(), m.end()))
        b.result()
      }
      assert(ours == ref, s"pattern=$p flags=$flags text=${text.take(200)}")
    }
  }

  test("replaceAll/countAll == java replaceAll/match count") {
    for (_ <- 0 until 200; p <- gated) {
      val text = randomText()
      val residual = DigitGated.split(p).get
      val ours = DigitGatedKernel.replaceAll(
        UTF8String.fromString(text), residual, "[X]").toString
      val ref = Pattern.compile(p).matcher(text).replaceAll("[X]")
      assert(ours == ref, s"pattern=$p text=${text.take(200)}")
      val n = DigitGatedKernel.countAll(UTF8String.fromString(text), residual)
      val m = Pattern.compile(p).matcher(text)
      var k = 0
      while (m.find()) k += 1
      assert(n == k)
    }
  }

  test("single-line worst case is linear: 500KB digit-free one-liner") {
    val text = Seq.fill(80000)("NODIGITSHERE").mkString(" ") // ~1MB, one line
    val residual = DigitGated.split(gated.head).get
    val t0 = System.nanoTime()
    val n = DigitGatedKernel.findAll(text, residual, 0).size
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 0)
    assert(secs < 2.0, f"gated scan took $secs%.2f s — not linear")
  }

  test("digit position edge cases: same token, line boundaries, at-position") {
    val cases = Seq(
      "ABCD1"            -> 1, // digit inside the token
      "ABCDE 7"          -> 1, // digit after, same line
      "ABCDE\n7"         -> 0, // digit on the NEXT line — lookahead fails
      "7 ABCDE"          -> 0, // digit before only
      "ABCDE 7 FGHIJ"    -> 1, // second token has no digit ahead...
      "ABCDE FGHIJ 7"    -> 2, // ...unless the digit is after both
      "ABCDE\rFGHIJ7"    -> 1) // \r terminates line 1 → only FGHIJ7 matches
    val p = """\b(?=.*\d)[A-Z0-9]{4,15}\b"""
    val residual = DigitGated.split(p).get
    cases.foreach { case (text, expect) =>
      val ours = DigitGatedKernel.findAll(text, residual, 0).size
      val m = Pattern.compile(p).matcher(text)
      var ref = 0
      while (m.find()) ref += 1
      assert(ref == expect, s"self-check: '$text' java=$ref expect=$expect")
      assert(ours == expect, s"'$text' ours=$ours expect=$expect")
    }
  }
}
