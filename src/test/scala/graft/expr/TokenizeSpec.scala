package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextAnalysis

/** The regex-free token kernels must match their java.util.regex
  * definitional twins EXACTLY — on ASCII, on Unicode edge cases (full
  * lowercase mappings like İ → i+U+0307, Kelvin K → k), and on
  * pathological separator runs. The kernels exist because JDK regex
  * throughput is serial under multithreading on this JVM (measured in
  * round 5's scale run: 0.78 → 43 ms/doc from 1 → 32 threads); these
  * specs pin that the 400× parallel speedup changed nothing semantic. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def regexTokens(s: String): Seq[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9']+")
      .filter(_.nonEmpty).toSeq

  private def regexWordCount(s: String): Long =
    s.split("\\s+").count(_.nonEmpty).toLong

  private val edgeCases = Seq(
    "", "   ", "a", "'", "''", "don't stop", "a1b2c3", ";;x;;",
    "Hello, WORLD!  multiple   spaces\tand\ttabs\nnewlines\f\r",
    "İstanbul KELVINK sign", "straße ß İİİ", "ﬁ ligature ﬁ",
    "中文 tokens mixed with english", "a'b''c'''d", "'leading trailing'",
    "123...456...789", "\u0000control\u0001chars", "ÅÉÎØÜ àéîøü")

  test("tokens == regex twin on edge cases") {
    edgeCases.foreach { s =>
      assert(TokenKernel.tokens(s).toSeq === regexTokens(s), s"input: [$s]")
    }
  }

  test("tokens == regex twin on seeded random unicode strings (property)") {
    val rnd = new scala.util.Random(20260814L)
    def randChar(): Char = rnd.nextInt(9) match {
      case 0 | 1 | 2 | 3 => ('a' + rnd.nextInt(26)).toChar
      case 4 => ('0' + rnd.nextInt(10)).toChar
      case 5 => (' ' + rnd.nextInt(95)).toChar // ascii printable
      case 6 => "\t\n\f\r'".charAt(rnd.nextInt(5))
      case _ => // any BMP char, surrogates excluded (lone halves are
        // not valid strings; paired handling is covered by edge cases)
        var c = rnd.nextInt(0xFFFF).toChar
        while (c >= 0xD800 && c <= 0xDFFF) c = rnd.nextInt(0xFFFF).toChar
        c
    }
    (1 to 500).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(120))(randChar()))
      assert(TokenKernel.tokens(s).toSeq === regexTokens(s), s"input: [$s]")
      assert(TokenKernel.tokenCount(s) === regexTokens(s).length.toLong)
      assert(TokenKernel.wordCount(s) === regexWordCount(s))
      assert(TokenKernel.bpeishCount(s) === TextAnalysis.bpeishCountRegex(s))
    }
  }

  test("shingle tokens (no apostrophe class) == regex twin") {
    val rx = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    (edgeCases :+ "don't").foreach { s =>
      assert(TokenKernel.shingleTokens(s).toSeq === rx(s), s"input: [$s]")
    }
  }

  /** Decode a [[TokenBytes]] arena back to tokens via the offsets. */
  private def decodeTokenBytes(tk: TokenBytes): Seq[String] =
    (0 until tk.count).map { i =>
      val end = tk.starts(i + 1) - 1 // sentinel convention
      new String(tk.bytes, tk.starts(i), end - tk.starts(i),
        java.nio.charset.StandardCharsets.UTF_8)
    }

  test("shingleTokenBytes: arena+offsets decode to exactly shingleTokens, " +
    "arena is the mkString(\" \") bytes (property incl. unicode)") {
    val rnd = new scala.util.Random(20260815L)
    def randChar(): Char = rnd.nextInt(9) match {
      case 0 | 1 | 2 | 3 => ('a' + rnd.nextInt(26)).toChar
      case 4 => ('0' + rnd.nextInt(10)).toChar
      case 5 => (' ' + rnd.nextInt(95)).toChar
      case 6 => "\t\n\f\rÉüİK".charAt(rnd.nextInt(8)) // incl. İ and Kelvin K
      case _ =>
        var c = rnd.nextInt(0xFFFF).toChar
        while (c >= 0xD800 && c <= 0xDFFF) c = rnd.nextInt(0xFFFF).toChar
        c
    }
    (edgeCases ++ (1 to 2000).map(_ =>
      new String(Array.fill(rnd.nextInt(120))(randChar())))).foreach { s =>
      val tk = TokenKernel.shingleTokenBytes(s)
      val expect = TokenKernel.shingleTokens(s).toSeq
      assert(decodeTokenBytes(tk) === expect, s"input: [$s]")
      assert(new String(tk.bytes, 0, tk.used,
        java.nio.charset.StandardCharsets.UTF_8) === expect.mkString(" "),
        s"arena mismatch on [$s]")
      assert(tk.starts(tk.count) == tk.used + 1)
    }
    val e = TokenKernel.shingleTokenBytes(null)
    assert(e.count == 0 && e.used == 0)
  }

  test("native expressions equal the Column regex forms on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val mismatches = docs.select(
        TextAnalysis.tokensCol(col("text")).as("fast"),
        filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= "")
          .as("slow"),
        graft.expr.Tokenize.tokenCountNative(col("text")).as("fastN"),
        graft.expr.Tokenize.wordCountNative(col("text")).as("fastW"),
        size(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .cast("long").as("slowW"))
      .filter(col("fast") =!= col("slow") ||
        col("fastN") =!= size(col("slow")).cast("long") ||
        col("fastW") =!= col("slowW"))
      .count()
    assert(mismatches === 0L)
  }

  test("native expressions: the non-ASCII fallback path equals the regex " +
    "forms (byte fast path must not change Unicode semantics)") {
    val df = edgeCases.toDF("text")
    val mismatches = df.select(
        TextAnalysis.tokensCol(col("text")).as("fast"),
        filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= "")
          .as("slow"),
        TextAnalysis.tokenCountCol(col("text")).as("fastN"),
        TextAnalysis.wordCountCol(col("text")).as("fastW"),
        size(filter(split(col("text"), "\\s+"), w => w =!= ""))
          .cast("long").as("slowW"))
      .filter(col("fast") =!= col("slow") ||
        col("fastN") =!= size(col("slow")).cast("long") ||
        col("fastW") =!= col("slowW"))
      .count()
    assert(mismatches === 0L)
  }

  test("null handling matches the twins") {
    val df = Seq[(Integer, String)]((1, null)).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokensCol(col("text")).as("t"),
      TextAnalysis.tokenCountCol(col("text")).as("n"),
      TextAnalysis.wordCountCol(col("text")).as("w")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
