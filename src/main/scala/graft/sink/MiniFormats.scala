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

  /** Rows of inline-string cells (S7 scan: inverse of [[xlsxBytes]]). */
  def xlsxRows(bytes: Array[Byte]): Seq[Seq[String]] =
    unzipEntry(bytes, "xl/worksheets/sheet1.xml").map { xml =>
      val s = new String(xml, UTF_8)
      "<row>(.*?)</row>".r.findAllMatchIn(s).map { r =>
        "<t[^>]*>(.*?)</t>".r.findAllMatchIn(r.group(1)).map { c =>
          c.group(1).replace("&amp;", "&").replace("&lt;", "<")
            .replace("&gt;", ">").replace("&quot;", "\"")
        }.toSeq
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

  /** Per-page text, pages joined with `\n` (read_pdf semantics — works on
    * uncompressed Tj streams like ours). */
  def pdfText(bytes: Array[Byte]): String = {
    val s = new String(bytes, UTF_8)
    val stream = "(?s)stream\n(.*?)\nendstream".r
    val tj = "\\((?:[^()\\\\]|\\\\.)*\\) Tj".r
    stream.findAllMatchIn(s).map { m =>
      tj.findAllIn(m.group(1)).map { t =>
        t.stripSuffix(" Tj").stripPrefix("(").stripSuffix(")")
          .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
      }.mkString("\n")
    }.mkString("\n")
  }
}
