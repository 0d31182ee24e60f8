package graft.expr

/** Unicode text-normalization kernel: NFC → strip combining marks
  * (NFD-decompose, drop \p{M}, recompose) → ROOT lowercase → collapse
  * non-alphanumeric runs to single spaces → trim. For Latin diacritics
  * this is byte-identical to DuckDB's
  * `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))), '[^a-z0-9]+', ' '))`
  * (probe-verified), so the oracle hash-gates it. Served to Spark either
  * as the `normalize_text` native codegen expression ([[NormalizeText]])
  * or the UDF twin in `graft.ops.Curation`.
  *
  * Pure-ASCII rows take a single-pass fast path: a jstack profile of the
  * 504k-doc curation run put HALF the redact-stage regex time inside
  * this kernel's two `replaceAll`s (the general path is six full scans —
  * NFD, \p{M}+ strip, NFC, lowercase, run-collapse, trim — with five
  * intermediate strings per doc). On ASCII input NFD/NFC are identities
  * and \p{M} cannot match, so lowercase+collapse+trim fuse into one
  * builder pass — bit-identical by construction and pinned against the
  * general path by a property spec ([[TextNormSpec]]). Any non-ASCII
  * char (cheap pre-scan) falls back to the general path unchanged.
  * Same-host back-to-back A/B at 504k docs (SCALE.md finding 18): the
  * curation quality/redact/profile stage 270 → 65 s, whole phase
  * 477 → 272.8 s, all other stage marks and every output count
  * identical.
  */
object TextNorm {
  private val NonAlnumRun = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: String): String = {
    if (s == null) return null
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) >= 0x80) return normalizeGeneral(s)
      i += 1
    }
    normalizeAscii(s)
  }

  /** One fused pass for ASCII input: lowercase A-Z, keep [a-z0-9], emit a
    * single space per interior non-alnum run (leading/trailing runs are
    * the trim). */
  private def normalizeAscii(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(lc)
      } else pendingSpace = true
      i += 1
    }
    out.toString
  }

  /** The general Unicode path — also the property-spec twin the ASCII
    * fast path is pinned against. */
  private[expr] def normalizeGeneral(s: String): String = {
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
