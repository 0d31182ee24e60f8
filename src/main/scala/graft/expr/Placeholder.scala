package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The FP/placeholder heuristic that gates TP/FP counting.
  *
  * Bit-exact re-expression of the reference's 10-rule test
  * (`modules/validator.py:147-194`). Two forms kept in lock-step (cross-tested
  * in `PlaceholderSpec`):
  *   - [[isPlaceholder]]: pure Scala, used in unit tests and driver-side code;
  *   - [[isPlaceholderCol]]: a composed built-in Column expression (lower /
  *     contains / rlike / regexp_replace / length) so the distributed
  *     validator stays inside whole-stage codegen — no UDF in the hot path.
  */
object Placeholder {

  /** Substring blocklist — `modules/validator.py:155-159`. */
  val Blocklist: Seq[String] = Seq(
    "xxx", "xxxx", "placeholder", "redacted", "example", "sample", "please",
    "share", "confidential", "document", "subject", "generated", "sig=xxxxx",
    "fake", "n/a", "number", "account")

  /** Pure-Scala form — mirrors `modules/validator.py:147-194` rule by rule. */
  def isPlaceholder(value: String): Boolean = {
    if (value == null) return true
    val s = value.trim
    if (s.isEmpty) return true
    val low = s.toLowerCase(java.util.Locale.ROOT)

    if (Blocklist.exists(low.contains)) return true
    if (low.contains("sig=") && (low.contains("xxxxx") || low.contains("fake"))) return true
    if (s.matches("[xX*\\-_]{3,}")) return true
    if (s.toSet.size == 1 && s.length >= 6) return true

    val digitsOnly = s.replaceAll("\\D", "")
    if (digitsOnly.nonEmpty) {
      if (digitsOnly.forall(_ == '0')) return true
      if (digitsOnly.length < 4 && digitsOnly.length < s.length) return true
    }

    val token = s.replaceAll("\\s+", "")
    if (token.length <= 2) return true

    if (s.matches("(?i)[a-z0-9._-]{1,6}")) return true

    val nonAlnum = s.count(ch => !Character.isLetterOrDigit(ch))
    if (nonAlnum.toDouble / math.max(1, s.length) > 0.6) return true

    if (java.util.regex.Pattern.compile("[ilIoO0]{6,}").matcher(s).find()) return true

    false
  }

  /** Native-expression form — ONE compiled kernel call per row via
    * [[IsPlaceholder]] (proven identical to the composed form in
    * NativeExpressionsSpec; the ~12-regex composed Column costs ~4s at
    * sf0.1 where this is sub-second). */
  def isPlaceholderFast(v: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IsPlaceholder(org.apache.spark.sql.GraftColumnBridge.expression(v)))

  /** Column form — same semantics, all built-ins (codegen'd, no UDF). */
  def isPlaceholderCol(v: Column): Column = {
    val s = trim(v)
    val low = lower(s)
    val len = length(s)

    val blocked = Blocklist.map(p => low.contains(lit(p))).reduce(_ || _)
    val sigRule = low.contains(lit("sig=")) &&
      (low.contains(lit("xxxxx")) || low.contains(lit("fake")))
    val maskRun = s.rlike("^[xX*\\-_]{3,}$")
    val singleChar = s.rlike("^(.)\\1{5,}$") // len(set)==1 && len>=6

    val digitsOnly = regexp_replace(s, "[^0-9]", "")
    val dLen = length(digitsOnly)
    val digitRules = (dLen > 0) &&
      (digitsOnly.rlike("^0+$") || (dLen < 4 && dLen < len))

    val token = regexp_replace(s, "\\s+", "")
    val shortToken = length(token) <= 2

    val shortSlug = s.rlike("(?i)^[a-z0-9._-]{1,6}$")

    val nonAlnum = length(regexp_replace(s, "[a-zA-Z0-9]", ""))
    val symbolHeavy = nonAlnum.cast("double") / greatest(lit(1), len).cast("double") > 0.6

    val ocrRun = s.rlike("[ilIoO0]{6,}")

    v.isNull || (length(trim(v)) === 0) || blocked || sigRule || maskRun ||
      singleChar || digitRules || shortToken || shortSlug || symbolHeavy || ocrRun
  }
}
