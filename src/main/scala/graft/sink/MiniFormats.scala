package graft.sink

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Minimal OOXML/PDF writers + readers for the stage-3 export formats.
  *
  * The environment has no python-docx / reportlab / PDFBox analog offline
  * (SURVEY.md §7.1), so the binary formats are hand-rolled to the smallest
  * spec-conformant shape:
  *   - DOCX (S10/S11, `modules/postprocessor.py:43-47` /
  *     `modules/validator.py:63-71`): a zip with [Content_Types].xml,
  *     _rels/.rels and word/document.xml, one <w:p> per `\n\n` paragraph.
  *   - XLSX (S6/S7, `modules/postprocessor.py:79-91`): inline-string
  *     worksheet, one row per record.
  *   - PDF (S12/S13, `modules/postprocessor.py:49-77` /
  *     `modules/validator.py:73-87`): uncompressed content streams,
  *     Helvetica 10, A4, 12pt leading, ~100-char greedy wrap (P11),
  *     page-break at the bottom margin.
  * Readers invert exactly what the writers emit (plus tag-stripping tolerant
  * enough for other simple producers).
  */
object MiniFormats {

  // ---------- shared zip helpers ----------
  private def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def unzipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val bos = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zis.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = zis.read(buf) }
          return Some(bos.toByteArray)
        }
        e = zis.getNextEntry
      }
      None
    } finally zis.close()
  }

  def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  // ---------- DOCX ----------
  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  /** One paragraph per `\n\n` block, like `write_docx`. */
  def docxBytes(text: String): Array[Byte] = {
    val paras = text.split("\n\n", -1).map { p =>
      s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEscape(p.replace("\n", " "))}</w:t></w:r></w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>$paras</w:body></w:document>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> ContentTypes.getBytes(UTF_8),
      "_rels/.rels" -> Rels.getBytes(UTF_8),
      "word/document.xml" -> doc.getBytes(UTF_8)))
  }

  /** Paragraph texts joined with `\n` (read_docx semantics). */
  def docxText(bytes: Array[Byte]): String =
    unzipEntry(bytes, "word/document.xml").map { xml =>
      val s = new String(xml, UTF_8)
      "<w:p[ >]".r.findAllMatchIn(s) // count only; extraction below
      val para = "<w:p(?:[^>]*)>(.*?)</w:p>".r
      para.findAllMatchIn(s).map { m =>
        val inner = m.group(1)
        val unTagged = inner.replaceAll("<[^>]+>", "")
        unTagged.replace("&amp;", "&").replace("&lt;", "<")
          .replace("&gt;", ">").replace("&quot;", "\"")
      }.mkString("\n")
    }.getOrElse("")

  // ---------- XLSX ----------
  private val XlsxContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val XlsxRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val XlsxWorkbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin

  private val XlsxWbRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Inline-string xlsx: `rows` includes the header row. */
  def xlsxBytes(rows: Seq[Seq[String]]): Array[Byte] = {
    val body = rows.map { r =>
      "<row>" + r.map(c =>
        s"""<c t="inlineStr"><is><t xml:space="preserve">${xmlEscape(if (c == null) "" else c)}</t></is></c>""").mkString + "</row>"
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
    zip(Seq(
      "[Content_Types].xml" -> XlsxContentTypes.getBytes(UTF_8),
      "_rels/.rels" -> XlsxRels.getBytes(UTF_8),
      "xl/workbook.xml" -> XlsxWorkbook.getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> XlsxWbRels.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))
  }

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Rows of cells (S7 scan). Reads BOTH dialects: our own inline-string
    * output (inverse of [[xlsxBytes]]) and externally-produced workbooks in
    * the shared-strings + cell-reference style (openpyxl/Excel — the
    * reference's `modules/validator.py:29-30` reads `mapping_final.xlsx`
    * with openpyxl, so scan parity requires this). Cell positions honor the
    * `r="A1"` reference so omitted empty cells keep columns aligned; rich
    *-text shared strings concatenate their `<t>` runs. */
  def xlsxRows(bytes: Array[Byte]): Seq[Seq[String]] =
    unzipEntry(bytes, "xl/worksheets/sheet1.xml").map { xml =>
      val s = new String(xml, UTF_8)
      val shared: IndexedSeq[String] =
        unzipEntry(bytes, "xl/sharedStrings.xml").map { sx =>
          "(?s)<si>(.*?)</si>".r.findAllMatchIn(new String(sx, UTF_8)).map { m =>
            "(?s)<t[^>]*>(.*?)</t>".r.findAllMatchIn(m.group(1))
              .map(t => xmlUnescape(t.group(1))).mkString
          }.toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
      def inlineText(body: String): String =
        "(?s)<t[^>]*>(.*?)</t>".r.findAllMatchIn(body)
          .map(t => xmlUnescape(t.group(1))).mkString
      "(?s)<row[^>]*>(.*?)</row>".r.findAllMatchIn(s).map { r =>
        val cells = scala.collection.mutable.ArrayBuffer[String]()
        "(?s)<c\\b([^>]*?)(?:/>|>(.*?)</c>)".r.findAllMatchIn(r.group(1))
          .foreach { c =>
            val attrs = c.group(1)
            val body = Option(c.group(2)).getOrElse("")
            val colIdx = "r=\"([A-Z]+)[0-9]+\"".r.findFirstMatchIn(attrs)
              .map(_.group(1).foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1)
              .getOrElse(cells.length)
            while (cells.length <= colIdx) cells += ""
            cells(colIdx) =
              if (attrs.contains("t=\"s\""))
                "<v>([0-9]+)</v>".r.findFirstMatchIn(body)
                  // unresolvable reference (missing/under-parsed
                  // sharedStrings) degrades to "" like every other
                  // malformed-input path in this reader
                  .flatMap(m => shared.lift(m.group(1).toInt)).getOrElse("")
              else if (attrs.contains("t=\"inlineStr\"")) inlineText(body)
              else "(?s)<v>(.*?)</v>".r.findFirstMatchIn(body)
                .map(m => xmlUnescape(m.group(1))).getOrElse(inlineText(body))
          }
        cells.toSeq
      }.toSeq
    }.getOrElse(Seq.empty)

  // ---------- PDF ----------

  /** P11 — greedy ~100-char word wrap + blank line per paragraph
    * (`modules/postprocessor.py:55-68`). */
  def wrapLines(text: String, width: Int = 100): Seq[String] = {
    val out = Seq.newBuilder[String]
    text.split("\n\n", -1).foreach { paragraph =>
      val words = paragraph.split("\\s+").filter(_.nonEmpty)
      var line = ""
      words.foreach { w =>
        if (line.length + 1 + w.length > width) { out += line; line = w }
        else line = if (line.isEmpty) w else line + " " + w
      }
      if (line.nonEmpty) out += line
      out += ""
    }
    out.result()
  }

  private def pdfEscape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** A4 595×842pt, margin 50, 12pt leading, page-break when y < 70 —
    * mirrors `write_pdf`'s layout loop. */
  def pdfBytes(text: String): Array[Byte] = {
    val (w, h, margin, lead) = (595, 842, 50, 12)
    val perPage = ((h - margin - 70) / lead) + 1
    val pages = wrapLines(text).map(_.take(200)).grouped(perPage).toSeq match {
      case Seq() => Seq(Seq(""))
      case ps    => ps
    }
    val nPages = pages.size
    // objects: 1 catalog, 2 pages, then per page: page obj + content obj; last: font
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    val kids = (0 until nPages).map(i => s"${3 + i * 2} 0 R").mkString(" ")
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    val fontObj = 3 + nPages * 2
    pages.zipWithIndex.foreach { case (lines, i) =>
      val contentObj = 4 + i * 2
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] /Contents $contentObj 0 R /Resources << /Font << /F1 $fontObj 0 R >> >> >>"
      val tj = lines.map(l => s"(${pdfEscape(l)}) Tj T*").mkString("\n")
      val stream = s"BT /F1 10 Tf $lead TL $margin ${h - margin} Td\n$tj\nET"
      objs += s"<< /Length ${stream.getBytes(UTF_8).length} >>\nstream\n$stream\nendstream"
    }
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = Seq.newBuilder[Int]
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets += sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
    }
    val xref = sb.length
    val offs = offsets.result()
    sb.append(f"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF")
    sb.toString.getBytes(UTF_8)
  }

  /** Adobe ASCII85 decode ('z' = four zero bytes, terminator `~>`,
    * whitespace ignored) — PDF `/ASCII85Decode` filter. */
  private[sink] def ascii85Decode(in: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Int](5)
    var n = 0
    val body = in.stripPrefix("<~").takeWhile(_ != '~')
    body.foreach { c =>
      if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        buf(n) = c - '!'; n += 1
        if (n == 5) {
          var v = 0L; buf.foreach(d => v = v * 85 + d)
          out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
          out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
          n = 0
        }
      } // anything else (whitespace) is ignored per spec
    }
    if (n > 1) { // partial group: pad with 'u', emit n-1 bytes
      var i = n
      while (i < 5) { buf(i) = 84; i += 1 }
      var v = 0L; buf.foreach(d => v = v * 85 + d)
      val bs = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bs, 0, n - 1)
    }
    out.toByteArray
  }

  /** zlib inflate (PDF `/FlateDecode`); retries raw-deflate for producers
    * that omit the zlib wrapper. */
  private[sink] def inflate(in: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(in)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      inf.end()
      out.toByteArray
    }
    try run(false)
    catch { case _: java.util.zip.DataFormatException => run(true) }
  }

  /** PDF string-literal unescape: \(, \), \\, \n, \r, \t, \b, \f, \ooo
    * octal, and line-continuation backslash. */
  private def pdfUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '\n' => i += 2
          case o if o >= '0' && o <= '7' =>
            var j = i + 1; var v = 0
            while (j < s.length && j < i + 4 &&
              s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb += v.toChar; i = j
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private val PdfStrLit = "\\((?:[^()\\\\]|\\\\.)*\\)"

  /** Text shown by one decoded content stream: every `(…) Tj` / `(…)'`
    * line plus `[…] TJ` arrays (pieces concatenated), in operator order.
    * None when the stream contains no text operator at all (so callers can
    * drop non-text streams without dropping genuinely blank pages). */
  private def pdfStreamText(content: String): Option[String] = {
    val op = (s"($PdfStrLit)\\s*(?:Tj|')" +
      s"|\\[((?:$PdfStrLit|[^\\]])*)\\]\\s*TJ").r
    val lit = PdfStrLit.r
    val pieces = op.findAllMatchIn(content).map { m =>
      if (m.group(1) != null)
        pdfUnescape(m.group(1).stripPrefix("(").stripSuffix(")"))
      else
        lit.findAllIn(m.group(2))
          .map(x => pdfUnescape(x.stripPrefix("(").stripSuffix(")"))).mkString
    }.toSeq
    if (pieces.isEmpty) None else Some(pieces.mkString("\n"))
  }

  /** Per-stream text, streams joined with `\n` (read_pdf semantics,
    * `modules/validator.py:73-87` parity). Handles our own uncompressed
    * Tj output AND externally-produced PDFs whose content streams are
    * `/FlateDecode` and/or `/ASCII85Decode` encoded (e.g. ReportLab, the
    * reference's own writer) — filters are applied in pipeline order from
    * the stream dictionary; image/XObject streams and undecodable data are
    * skipped rather than leaking binary garbage into the text. */
  def pdfText(bytes: Array[Byte]): String = {
    // ISO-8859-1 is byte-preserving both ways: regex over the chars, then
    // getBytes recovers the exact raw stream bytes for the inflater
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val stream = "(?s)stream\r?\n(.*?)endstream".r
    stream.findAllMatchIn(s).flatMap { m =>
      val dictStart = math.max(0, s.lastIndexOf("obj", m.start))
      val dict = s.substring(dictStart, m.start)
      if (dict.contains("/Image") || dict.contains("/XObject")) None
      else try {
        var data = m.group(1)
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        if (dict.contains("/ASCII85Decode"))
          data = ascii85Decode(new String(data,
            java.nio.charset.StandardCharsets.ISO_8859_1))
        if (dict.contains("/FlateDecode")) data = inflate(data)
        pdfStreamText(new String(data,
          java.nio.charset.StandardCharsets.ISO_8859_1))
      } catch { case _: Exception => None }
    }.mkString("\n")
  }
}
