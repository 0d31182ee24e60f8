package graft.expr

/** Unicode text-normalization kernel: NFC → strip combining marks
  * (NFD-decompose, drop \p{M}, recompose) → ROOT lowercase → collapse
  * non-alphanumeric runs to single spaces → trim. For Latin diacritics
  * this is byte-identical to DuckDB's
  * `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))), '[^a-z0-9]+', ' '))`
  * (probe-verified), so the oracle hash-gates it. One compiled pass per
  * row. Served to Spark either as the `normalize_text` native codegen
  * expression ([[NormalizeText]]) or the UDF twin in `graft.ops.Curation`.
  */
object TextNorm {
  private val NonAlnumRun = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: String): String = {
    if (s == null) return null
    import java.text.Normalizer
    // NFD directly — NFD(NFC(s)) == NFD(s) by canonical equivalence, so a
    // leading NFC pass would be a third full scan for an identical result
    val stripped = Normalizer.normalize(
      CombiningMarks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
        .replaceAll(""),
      Normalizer.Form.NFC)
    NonAlnumRun.matcher(stripped.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ").trim
  }
}
