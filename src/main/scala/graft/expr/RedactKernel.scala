package graft.expr

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Conservative static analysis of a java.util.regex pattern, deriving the
  * facts that make redaction-scan GATING sound (SCALE.md finding 13):
  *
  *  - `requiresDigit`: every match of the pattern contains ≥ 1 ASCII digit
  *    MATCHED INSIDE the match (digits inside lookarounds do not count —
  *    they may lie outside the matched span).
  *  - `maxLen`: an upper bound on the match length in UTF-16 chars
  *    (`Unbounded` when any mandatory part repeats without limit).
  *  - `literals`: literal runs guaranteed to occur in the DOCUMENT at
  *    every match (inside the match, or adjacent via a positive
  *    lookaround); for alternations, a common substring of every
  *    branch's runs. Used for doc-level containment gates only.
  *
  * The analyzer is CONSERVATIVE in the safe direction: any construct it
  * cannot prove facts for weakens the facts (requiresDigit=false,
  * maxLen=Unbounded, literals=Nil) and the pattern falls back to a full
  * scan — gating is only ever applied when the parse PROVES it sound.
  * Supported subset (everything the SIT dimension uses): literals,
  * escapes, character classes with ranges, non-capturing/capturing
  * groups, inline `(?i...)` flag groups, lookahead/lookbehind
  * (zero-width, facts discarded), alternation, and the `? * + {m} {m,}
  * {m,n}` quantifiers with optional reluctant `?`. Atoms that can match
  * a supplementary code point (`.`, `\S`, `\W`, `\D`, negated classes)
  * count 2 chars toward `maxLen`.
  */
private[graft] object RegexFacts {

  final val Unbounded = Int.MaxValue

  case class Facts(requiresDigit: Boolean, maxLen: Int,
                   literals: Seq[String])

  private val Zero = Facts(requiresDigit = false, 0, Nil)
  private def unknown = Facts(requiresDigit = false, Unbounded, Nil)

  /** None when the pattern contains constructs outside the supported
    * subset — callers must treat that as "no facts" (full scan). */
  def analyze(regex: String): Option[Facts] =
    try {
      val p = new Parser(regex)
      val f = p.parseAlternation()
      if (p.pos != regex.length) None else Some(f)
    } catch { case _: UnsupportedConstruct => None }

  private final class UnsupportedConstruct extends RuntimeException

  private def addLen(a: Int, b: Int): Int =
    if (a == Unbounded || b == Unbounded) Unbounded
    else if (a.toLong + b > Int.MaxValue - 1) Unbounded
    else a + b

  private def mulLen(a: Int, n: Int): Int =
    if (a == 0) 0
    else if (a == Unbounded || n == Unbounded) Unbounded
    else if (a.toLong * n > Int.MaxValue - 1) Unbounded
    else a * n

  /** longest string contained in some literal of EVERY branch; "" if none */
  private def commonLiteral(branches: Seq[Seq[String]]): Seq[String] = {
    if (branches.exists(_.isEmpty)) return Nil
    val first = branches.head
    // candidates: all substrings (≥ 3 chars) of the first branch's runs,
    // longest first — the run sets here are tiny (≤ a few runs of ≤ 16
    // chars), so the quadratic candidate walk is irrelevant
    val cands = first.flatMap { r =>
      for (i <- 0 until r.length; j <- i + 3 to r.length) yield r.substring(i, j)
    }.distinct.sortBy(-_.length)
    cands.find(c => branches.forall(_.exists(_.contains(c))))
      .map(Seq(_)).getOrElse(Nil)
  }

  private final class Parser(s: String) {
    var pos = 0
    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    private def eof: Boolean = pos >= s.length
    private def fail(): Nothing = throw new UnsupportedConstruct

    def parseAlternation(): Facts = {
      var branches = List(parseConcat())
      while (!eof && peek == '|') {
        pos += 1
        branches ::= parseConcat()
      }
      branches match {
        case single :: Nil => single
        case many =>
          Facts(many.forall(_.requiresDigit),
            many.map(_.maxLen).max,
            commonLiteral(many.map(_.literals)))
      }
    }

    private def parseConcat(): Facts = {
      var requires = false
      var len = 0
      val literals = Seq.newBuilder[String]
      val run = new java.lang.StringBuilder
      def flushRun(): Unit = {
        if (run.length > 0) { literals += run.toString; run.setLength(0) }
      }
      while (!eof && peek != '|' && peek != ')') {
        val atom = parseAtom()
        val (minRep, maxRep) = parseQuantifier()
        if (atom.requiresDigit && minRep >= 1) requires = true
        len = addLen(len, mulLen(atom.maxLen, maxRep))
        atom match {
          case LiteralAtom(c) if minRep == 1 && maxRep == 1 =>
            run.append(c) // extends the current mandatory literal run
          case _ =>
            flushRun()
            // a repeated-at-least-once group still guarantees its own
            // literals (e.g. (abc){2} contains "abc")
            if (minRep >= 1) literals ++= atom.literals
        }
      }
      flushRun()
      Facts(requires, len, literals.result().filter(_.nonEmpty))
    }

    /** an atom's facts; LiteralAtom marks single mandatory literal chars
      * so the concat can merge adjacent ones into runs */
    private def LiteralAtom(c: Char): Facts =
      Facts(c >= '0' && c <= '9', 1, Seq(c.toString))
    private object LiteralAtom {
      def unapply(f: Facts): Option[Char] =
        f.literals match {
          case Seq(one) if one.length == 1 && f.maxLen == 1 => Some(one.charAt(0))
          case _ => None
        }
    }

    private def parseAtom(): Facts = peek match {
      case '(' =>
        pos += 1
        if (peek == '?') {
          pos += 1
          peek match {
            case ':' => pos += 1; val f = parseAlternation(); expect(')'); f
            case '=' =>
              // positive lookahead: zero-width, contributes no in-match
              // digits or length — but its literals DO occur in the
              // document adjacent to every match, which is exactly what
              // the doc-level literal gate needs
              pos += 1; val f = parseAlternation(); expect(')')
              Facts(requiresDigit = false, 0, f.literals)
            case '!' =>
              pos += 1; parseAlternation(); expect(')'); Zero // negative
            case '<' =>
              pos += 1
              peek match {
                case '=' =>
                  pos += 1; val f = parseAlternation(); expect(')')
                  Facts(requiresDigit = false, 0, f.literals) // lookbehind
                case '!' =>
                  pos += 1; parseAlternation(); expect(')'); Zero
                case _ => fail() // named group — unsupported
              }
            case c if c == 'i' || c == 'm' || c == 's' || c == 'u' ||
                c == 'd' || c == '-' =>
              // inline flag group (?i) / (?i:...) / (?i-m:...) — these
              // flags don't change the digit/length facts; ci literals
              // still gate (the literal check is always case-insensitive).
              // COMMENTS mode (?x) DOES change how the remainder parses
              // (whitespace and #-comments are ignored by the engine but
              // would become literal atoms here) → unsupported, as is any
              // flag letter outside the validated set.
              while (!eof && (peek == 'i' || peek == 'm' || peek == 's' ||
                peek == 'u' || peek == 'd' || peek == '-')) pos += 1
              if (peek == ':') { pos += 1; val f = parseAlternation(); expect(')'); f }
              else { expect(')'); Zero }
            case _ => fail()
          }
        } else { val f = parseAlternation(); expect(')'); f }
      case '[' => parseClass()
      case '\\' => parseEscape()
      case '.' =>
        pos += 1
        Facts(requiresDigit = false, 2, Nil) // may match a supplementary pair
      case '^' | '$' => pos += 1; Zero
      case '|' | ')' => fail() // callers handle — reaching here is a bug
      case '?' | '*' | '+' | '{' => fail() // dangling quantifier
      case c =>
        pos += 1
        LiteralAtom(c)
    }

    private def expect(c: Char): Unit = {
      if (eof || peek != c) fail()
      pos += 1
    }

    private def parseEscape(): Facts = {
      pos += 1
      if (eof) fail()
      val c = peek
      pos += 1
      c match {
        case 'd' => Facts(requiresDigit = true, 1, Nil)
        case 'D' | 'W' | 'S' => Facts(requiresDigit = false, 2, Nil)
        case 'w' | 's' => Facts(requiresDigit = false, 1, Nil)
        case 'b' | 'B' | 'A' | 'z' | 'Z' => Zero
        case 'n' => LiteralAtom('\n')
        case 't' => LiteralAtom('\t')
        case 'r' => LiteralAtom('\r')
        case 'f' => LiteralAtom('\f')
        case '.' | '\\' | '(' | ')' | '[' | ']' | '{' | '}' | '|' | '?' |
             '*' | '+' | '^' | '$' | '-' | '/' | ' ' | '#' | '=' | '&' |
             '%' | '_' | ',' | ':' | ';' | '@' | '!' | '<' | '>' | '"' |
             '\'' =>
          LiteralAtom(c)
        case _ => fail() // \p{...}, backrefs, \u…, \Q…\E — unsupported
      }
    }

    /** character class: requiresDigit iff every member is an ASCII digit;
      * width 1 unless the class is negated or can match a surrogate */
    private def parseClass(): Facts = {
      expect('[')
      var negated = false
      if (peek == '^') { negated = true; pos += 1 }
      var allDigits = true
      var sawMember = false
      var wide = negated // a negated class can match supplementary pairs
      def member(lo: Char, hi: Char): Unit = {
        sawMember = true
        if (!(lo >= '0' && hi <= '9')) allDigits = false
        if (hi >= '\uD800') wide = true
      }
      while (!eof && peek != ']') {
        // Java class-intersection / nested-class syntax would mis-parse as
        // ordinary members (the inner ']' would close the class early and
        // leave trailing chars as mandatory literal atoms) → unsupported
        if (peek == '[') fail()
        if (peek == '&' && pos + 1 < s.length && s.charAt(pos + 1) == '&')
          fail()
        val lo: Char = peek match {
          case '\\' =>
            pos += 1
            if (eof) fail()
            val e = peek; pos += 1
            e match {
              case 'd' => member('0', '9'); '\u0000'
              case 's' | 'w' => member('a', 'z'); '\u0000' // non-digit member
              case 'S' | 'W' | 'D' => wide = true; member('a', 'z'); '\u0000'
              case 'n' => member('\n', '\n'); '\n'
              case 't' => member('\t', '\t'); '\t'
              case 'r' => member('\r', '\r'); '\r'
              case c2 if "\\^]-[.(){}|?*+$/= &%_#,:;@!<>\"'".indexOf(c2) >= 0 =>
                member(c2, c2); c2
              case _ => fail()
            }
          case c =>
            pos += 1
            member(c, c)
            c
        }
        // range?
        if (!eof && peek == '-' && pos + 1 < s.length &&
          s.charAt(pos + 1) != ']') {
          pos += 1
          val hi: Char = peek match {
            case '\\' =>
              pos += 1
              if (eof) fail()
              val e = peek; pos += 1
              e match {
                case c2 if "\\^]-[.(){}|?*+$/= &%_#,:;@!<>\"'".indexOf(c2) >= 0 => c2
                case _ => fail()
              }
            case c2 => pos += 1; c2
          }
          member(lo, hi)
        }
      }
      expect(']')
      if (!sawMember) fail()
      // a negated class can never PROVE a digit requirement: [^0-9] has
      // only digit members but matches exclusively NON-digits
      Facts(allDigits && !negated, if (wide) 2 else 1, Nil)
    }

    /** (min, max) repetitions; (1, 1) when no quantifier follows */
    private def parseQuantifier(): (Int, Int) = {
      if (eof) return (1, 1)
      val q = peek match {
        case '?' => pos += 1; (0, 1)
        case '*' => pos += 1; (0, Unbounded)
        case '+' => pos += 1; (1, Unbounded)
        case '{' =>
          val close = s.indexOf('}', pos)
          if (close < 0) fail()
          val body = s.substring(pos + 1, close)
          pos = close + 1
          val parts = body.split(",", -1)
          try {
            parts match {
              case Array(m) => (m.trim.toInt, m.trim.toInt)
              case Array(m, "") => (m.trim.toInt, Unbounded)
              case Array(m, n) => (m.trim.toInt, n.trim.toInt)
              case _ => fail()
            }
          } catch { case _: NumberFormatException => fail() }
        case _ => return (1, 1)
      }
      // reluctant / possessive suffix
      if (!eof && (peek == '?')) pos += 1
      else if (!eof && peek == '+') fail() // possessive — unsupported
      q
    }
  }
}

/** Fused multi-pattern redaction kernel (SCALE.md finding 13): one string
  * conversion per document, every pattern scan GATED by the facts
  * [[RegexFacts]] proves about it, copies only when a pattern actually
  * matched. Replaces the per-pattern `regexp_replace` Column chain, which
  * paid a UTF8String→String conversion + full StringBuffer copy + fresh
  * UTF8String per pattern per document EVEN WITH ZERO MATCHES (~90 full
  * copies of every doc), and ran every regex over all of every doc.
  *
  * Gates (sound by construction — see each):
  *  - **digit windows**: when every match contains a digit and spans
  *    ≤ `WindowRadius` chars, matches can only start inside the merged
  *    `[d − R, d + R + 1)` windows around digit positions: a match
  *    contains some digit d, so it starts in `(d − len, d]` and ends in
  *    `[d + 1, d + len)` — inside the window whenever `len ≤ R`. The
  *    matcher runs per window with TRANSPARENT bounds (lookarounds and
  *    `\b` see the real surrounding text, exactly like a full scan) and
  *    non-anchoring bounds. Only 3.6% of the 504k-doc corpus is within
  *    48 chars of a digit, so these patterns scan 27× less text.
  *  - **required literal**: when every branch provably contains a literal
  *    run, a document not containing it (case-insensitively — always ci,
  *    which over-admits but never under-admits) cannot match; the gate is
  *    a vectorizable substring scan instead of a regex run.
  *  - **digit-gated lookaheads** (`\b(?=.*\d)TOKEN\b` family) keep their
  *    dedicated linear [[DigitGatedKernel]] path.
  *  - everything else takes the plain full matcher, same as before.
  *
  * Fold semantics are IDENTICAL to the legacy chain: patterns apply in
  * order, each on the previous pattern's output; counts accumulate per
  * pattern over the ORIGINAL text (RedactKernelSpec pins equality on real
  * corpora and adversarial boundary cases; q34's DuckDB oracle stays the
  * cross-engine gate). */
object RedactKernel {

  /** radius of the digit windows; sound for patterns with maxLen ≤ this */
  final val WindowRadius = 48

  private sealed trait Gate extends Serializable
  private case object FullScan extends Gate
  private case object DigitWindow extends Gate
  private final case class RequiredLiteral(lowerLit: String) extends Gate
  private final case class GatedLookahead(residual: String) extends Gate

  private final case class CompiledPat(id: String, regex: String, gate: Gate) {
    @transient lazy val pattern: Pattern =
      Pattern.compile(gate match {
        case GatedLookahead(r) => r
        case _ => regex
      })
    @transient lazy val replacement: String = "[" + id + "]"
  }

  /** gate chosen for `regex` — exposed for the classification pin spec */
  private[graft] def gateName(regex: String): String =
    deriveGate(regex) match {
      case FullScan => "full"
      case DigitWindow => "digit-window"
      case RequiredLiteral(l) => s"literal:$l"
      case GatedLookahead(_) => "digit-gated-lookahead"
    }

  private def isAsciiLit(lit: String): Boolean = lit.forall(_ < 128)

  private def deriveGate(regex: String): Gate =
    DigitGated.split(regex) match {
      case Some(residual) => GatedLookahead(residual)
      case None =>
        RegexFacts.analyze(regex) match {
          case Some(f) if f.requiresDigit && f.maxLen <= WindowRadius =>
            DigitWindow
          case Some(f) if f.literals.exists(isAsciiLit) =>
            // only pure-ASCII literals: containsCi folds ASCII A-Z only,
            // so a non-ASCII uppercase char (É → "é") could never match
            // the document scan and would silently gate out real matches
            RequiredLiteral(f.literals.filter(isAsciiLit).maxBy(_.length)
              .toLowerCase(java.util.Locale.ROOT))
          case _ => FullScan
        }
    }

  private val compileCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)],
      IndexedSeq[CompiledPat]]()

  private def compiled(pats: Seq[(String, String)]): IndexedSeq[CompiledPat] =
    compileCache.computeIfAbsent(pats,
      _.map { case (id, re) => CompiledPat(id, re, deriveGate(re)) }
        .toIndexedSeq)

  /** ASCII case-insensitive contains; `lit` must be lowercase */
  private def containsCi(s: String, lit: String): Boolean = {
    val n = s.length; val m = lit.length
    if (m == 0) return true
    var i = 0
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val c = s.charAt(i + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        ok = lc == lit.charAt(j)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** merged digit windows of `s` as parallel (start, end) arrays; count
    * in the third slot. Reused across all digit-window patterns on the
    * same string. */
  private def digitWindows(s: String): (Array[Int], Array[Int], Int) = {
    val n = s.length
    var st = new Array[Int](8)
    var en = new Array[Int](8)
    var cnt = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        val ws = math.max(0, i - WindowRadius)
        val we = math.min(n, i + WindowRadius + 1)
        if (cnt > 0 && ws <= en(cnt - 1)) {
          if (we > en(cnt - 1)) en(cnt - 1) = we // merge/extend
        } else {
          if (cnt == st.length) {
            st = java.util.Arrays.copyOf(st, cnt * 2)
            en = java.util.Arrays.copyOf(en, cnt * 2)
          }
          st(cnt) = ws; en(cnt) = we; cnt += 1
        }
      }
      i += 1
    }
    (st, en, cnt)
  }

  /** leftmost matches of `p` on `s` restricted to the proven-sound
    * region set, exactly equal to a full scan's match set */
  private def scanGated(p: CompiledPat, s: String,
                        wins: (Array[Int], Array[Int], Int))
                       (onMatch: (Int, Int) => Unit): Unit = p.gate match {
    case GatedLookahead(residual) =>
      DigitGatedKernel.findAll(s, residual, 0).foreach { case (a, b) =>
        onMatch(a, b)
      }
    case DigitWindow =>
      val (st, en, cnt) = wins
      val m = p.pattern.matcher(s)
      m.useTransparentBounds(true)
      m.useAnchoringBounds(false)
      var w = 0
      while (w < cnt) {
        m.region(st(w), en(w))
        while (m.find()) onMatch(m.start(), m.end())
        w += 1
      }
    case RequiredLiteral(lit) =>
      if (containsCi(s, lit)) {
        val m = p.pattern.matcher(s)
        while (m.find()) onMatch(m.start(), m.end())
      }
    case FullScan =>
      val m = p.pattern.matcher(s)
      while (m.find()) onMatch(m.start(), m.end())
  }

  /** total match count over the ORIGINAL text, all patterns — the
    * n_redactions column */
  def countAll(text: UTF8String, pats: Seq[(String, String)]): Long = {
    val cp = compiled(pats)
    val s = text.toString
    var wins: (Array[Int], Array[Int], Int) = null
    var count = 0L
    var i = 0
    while (i < cp.length) {
      val p = cp(i)
      if (p.gate == DigitWindow && wins == null) wins = digitWindows(s)
      scanGated(p, s, wins)((_, _) => count += 1)
      i += 1
    }
    count
  }

  /** sequential fold-replace of all patterns — the redacted_text column;
    * returns the input UTF8String unchanged (no copy) when nothing
    * matched */
  def redactAll(text: UTF8String, pats: Seq[(String, String)]): UTF8String = {
    val cp = compiled(pats)
    val s0 = text.toString
    var cur = s0
    var wins: (Array[Int], Array[Int], Int) = null
    var i = 0
    while (i < cp.length) {
      val p = cp(i)
      if (p.gate == DigitWindow && wins == null) wins = digitWindows(cur)
      var sb: java.lang.StringBuilder = null
      var last = 0
      scanGated(p, cur, wins) { (a, b) =>
        if (sb == null) sb = new java.lang.StringBuilder(cur.length)
        sb.append(cur, last, a).append(p.replacement)
        last = b
      }
      if (sb != null) {
        sb.append(cur, last, cur.length)
        cur = sb.toString
        wins = null // digit positions moved — recompute on next gated pat
      }
      i += 1
    }
    if (cur eq s0) text else UTF8String.fromString(cur)
  }
}

/** `redact_all(text)` — the fused fold-replace over the whole SIT pattern
  * list in one native call. */
case class RedactAll(child: Expression, pats: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "redact_all"
  override protected def nullSafeEval(input: Any): Any =
    RedactKernel.redactAll(input.asInstanceOf[UTF8String], pats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("pats", pats,
      "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev, c => s"graft.expr.RedactKernel.redactAll($c, $ps)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `redact_count_all(text)` — total match count of the same pattern list
  * over the original text. */
case class RedactCountAll(child: Expression, pats: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "redact_count_all"
  override protected def nullSafeEval(input: Any): Any =
    RedactKernel.countAll(input.asInstanceOf[UTF8String], pats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("pats", pats,
      "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev, c => s"graft.expr.RedactKernel.countAll($c, $ps)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RedactExprs {
  def redactAllCol(text: Column, pats: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      RedactAll(GraftColumnBridge.expression(text), pats))
  def countAllCol(text: Column, pats: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      RedactCountAll(GraftColumnBridge.expression(text), pats))
}
