package graft.expr

/** Check-digit algorithms used by the TP value generators.
  *
  * Semantics match the reference's generators (behavior only, clean-room):
  *   - Luhn mod-10 check digit: `modules/content_generator.py:27-36`
  *   - ISO-13616 IBAN mod-97 checksum (9-digit chunked, BigInt-free):
  *     `modules/content_generator.py:50-67`
  */
object Checksums {

  /** Luhn check digit for a digit-string body (digits only). */
  def luhnCheckDigit(body: String): Int = {
    var total = 0
    val n = body.length
    var i = n - 1
    var double = true // rightmost body digit gets doubled (check digit appended after)
    while (i >= 0) {
      val d = body.charAt(i) - '0'
      if (double) {
        val dd = d * 2
        total += (if (dd > 9) dd - 9 else dd)
      } else total += d
      double = !double
      i -= 1
    }
    (10 - (total % 10)) % 10
  }

  /** Full-number Luhn validity (16-digit CCN etc., separators ignored). */
  def luhnValid(s: String): Boolean = {
    val digits = s.filter(_.isDigit)
    if (digits.isEmpty) return false
    var total = 0
    var i = digits.length - 1
    var double = false
    while (i >= 0) {
      val d = digits.charAt(i) - '0'
      if (double) {
        val dd = d * 2
        total += (if (dd > 9) dd - 9 else dd)
      } else total += d
      double = !double
      i -= 1
    }
    total % 10 == 0
  }

  /** Letter→number expansion for IBAN (A→10 .. Z→35). */
  private def ibanExpand(s: String): String = {
    val sb = new StringBuilder
    s.foreach { ch =>
      if (ch.isDigit) sb.append(ch)
      else sb.append((ch.toUpper - 55).toString)
    }
    sb.toString
  }

  /** ISO-13616 check digits for `country + bban` ("00" placeholder form). */
  def ibanCheckDigits(countryCode: String, bban: String): String = {
    val numeric = ibanExpand(bban + countryCode + "00")
    var remainder = 0L
    var i = 0
    while (i < numeric.length) {
      val block = remainder.toString + numeric.substring(i, math.min(i + 9, numeric.length))
      remainder = block.toLong % 97
      i += 9
    }
    f"${98 - remainder}%02d"
  }

  /** Full-IBAN validity: move first 4 chars to end, expand, mod 97 == 1. */
  def ibanValid(iban: String): Boolean = {
    val s = iban.replaceAll("\\s", "")
    if (s.length < 5) return false
    val rearranged = s.substring(4) + s.substring(0, 4)
    val numeric = ibanExpand(rearranged)
    var remainder = 0L
    var i = 0
    while (i < numeric.length) {
      val block = remainder.toString + numeric.substring(i, math.min(i + 9, numeric.length))
      remainder = block.toLong % 97
      i += 9
    }
    remainder == 1
  }
}
