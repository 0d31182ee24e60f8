package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{DefaultSits, SitValues}

/** V1 Luhn + V3 mod-97 kernels, exercised against the SIT regexes
  * (SURVEY.md §5: every TP generator's output matches its own pattern).
  * Deterministic key sweeps stand in for scalacheck (offline env). */
class ChecksumsSpec extends AnyFunSuite {

  test("luhn check digit: known values") {
    // 4539148803436467 is a canonical valid Visa test number
    assert(Checksums.luhnValid("4539148803436467"))
    assert(Checksums.luhnCheckDigit("453914880343646") == 7)
    assert(!Checksums.luhnValid("4539148803436466"))
    assert(Checksums.luhnValid("79927398713")) // classic example
  }

  test("iban mod-97: canonical example validates") {
    assert(Checksums.ibanValid("GB82WEST12345698765432")) // ISO 13616 example
    assert(!Checksums.ibanValid("GB82WEST12345698765431"))
  }

  test("iban check digits round-trip through validity") {
    (1L to 500L).foreach { k =>
      val bban = f"${DetHash.hash2(k, 7) >>> 12}%016d".takeRight(16)
      val iban = "GB" + Checksums.ibanCheckDigits("GB", bban) + bban
      assert(Checksums.ibanValid(iban), s"invalid: $iban")
    }
  }

  private val regexById = DefaultSits.all.map(s => s.id -> s.regex).toMap

  private def fullPattern(id: String) =
    java.util.regex.Pattern.compile(regexById(id),
      java.util.regex.Pattern.MULTILINE | java.util.regex.Pattern.CASE_INSENSITIVE)

  test("generated CCN is Luhn-valid and matches SIT_CCN regex") {
    for (key <- 1L to 200L; slot <- 0L to 5L) {
      val ccn = SitValues.ccn(key, slot * 64)
      assert(Checksums.luhnValid(ccn), s"luhn fail: $ccn")
      assert(fullPattern("SIT_CCN").matcher(ccn).find(), s"regex fail: $ccn")
    }
  }

  test("generated IBAN is mod97-valid and matches SIT_IBAN regex") {
    (1L to 500L).foreach { key =>
      val iban = SitValues.iban(key, 0)
      assert(Checksums.ibanValid(iban), s"mod97 fail: $iban")
      assert(fullPattern("SIT_IBAN").matcher(iban).find(), s"regex fail: $iban")
    }
  }

  test("TP values match their own SIT regex (self-matching SITs)") {
    // SITs whose regex matches the bare value (no keyword prefix required)
    val selfMatching = Seq("SIT_CCN", "SIT_SSN", "SIT_ABA", "SIT_DEA",
      "SIT_ICD9", "SIT_SWIFT", "SIT_CAN_SIN", "SIT_CAN_BANK", "SIT_AUS_TFN",
      "SIT_CAN_DRIVER", "SIT_CAN_HEALTH", "SIT_AUS_DRIVER", "SIT_AUS_PASSPORT",
      "SIT_AUS_BANK", "SIT_AZURE_SAS", "SIT_CAN_PASSPORT", "SIT_AUS_MEDACC",
      "SIT_IBAN", "SIT_BR_CPF", "SIT_BR_RG", "SIT_UK_NINO", "SIT_FR_INSEE",
      "SIT_IP", "SIT_ICD10", "SIT_EU_DEBIT")
    val names = DefaultSits.all.map(s => s.id -> s.name).toMap
    for (key <- 1L to 100L; slot <- 0L to 3L; id <- selfMatching) {
      val v = SitValues.value(id, names(id), "TP", key, slot)
      assert(fullPattern(id).matcher(v).find(), s"$id value '$v' misses its regex")
    }
  }

  test("FP values never count as real: placeholder-flagged OR regex-missed") {
    // The validator counts a match as real only if it matches the SIT regex
    // AND passes the placeholder heuristic; an FP literal must fail one of
    // the two (e.g. IP's '999.999.999.999' is heuristic-clean but can never
    // match the octet-bounded IP regex).
    DefaultSits.all.foreach { s =>
      val fp = SitValues.fpValue(s.id, s.name)
      val caught = Placeholder.isPlaceholder(fp) ||
        s.regex.isEmpty || !fullPattern(s.id).matcher(fp).find()
      assert(caught, s"${s.id} FP '$fp' would be counted as a real hit")
    }
  }
}
