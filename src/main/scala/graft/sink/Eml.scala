package graft.sink

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** S14/S15 — EML (RFC-2822/MIME) build + parse, hand-rolled (no
  * `email.message.EmailMessage` analog offline).
  *
  * Build mirrors `modules/postprocessor.py:102-115`: Subject/From/To/Date
  * headers; single-part text/plain without attachments, multipart/mixed with
  * base64 attachments otherwise. Parse mirrors `modules/validator.py:89-103`:
  * keep the text/plain parts only.
  */
object Eml {

  case class Attachment(filename: String, mimeType: String, data: Array[Byte])

  /** P10 — extension → MIME map (`modules/postprocessor.py:94-97`). */
  def guessMime(filename: String): String = {
    val ext = filename.toLowerCase.replaceAll("^.*\\.", "")
    ext match {
      case "txt"  => "text/plain"
      case "pdf"  => "application/pdf"
      case "docx" => "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
      case "xlsx" => "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
      case "eml"  => "message/rfc822"
      case _      => "application/octet-stream"
    }
  }

  private def b64Wrapped(data: Array[Byte]): String =
    Base64.getEncoder.encodeToString(data).grouped(76).mkString("\n")

  /** `date` is an injected RFC-2822 string (wall-clock in the reference). */
  def build(subject: String, from: String, to: String, date: String,
            body: String, attachments: Seq[Attachment] = Seq.empty): String = {
    val head =
      s"Subject: $subject\nFrom: $from\nTo: $to\nDate: $date\nMIME-Version: 1.0\n"
    if (attachments.isEmpty) {
      head +
        "Content-Type: text/plain; charset=\"utf-8\"\nContent-Transfer-Encoding: 8bit\n\n" +
        body + "\n"
    } else {
      val boundary = "===============graft=="
      val sb = new StringBuilder(head)
      sb.append(s"""Content-Type: multipart/mixed; boundary="$boundary"""").append("\n\n")
      sb.append(s"--$boundary\n")
      sb.append("Content-Type: text/plain; charset=\"utf-8\"\nContent-Transfer-Encoding: 8bit\n\n")
      sb.append(body).append("\n")
      attachments.foreach { a =>
        sb.append(s"--$boundary\n")
        sb.append(s"Content-Type: ${a.mimeType}\n")
        sb.append("Content-Transfer-Encoding: base64\n")
        sb.append(s"""Content-Disposition: attachment; filename="${a.filename}"""").append("\n\n")
        sb.append(b64Wrapped(a.data)).append("\n")
      }
      sb.append(s"--$boundary--\n")
      sb.toString
    }
  }

  private def headerOf(raw: String, name: String): Option[String] =
    raw.linesIterator.find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
      .map(_.split(":", 2)(1).trim)

  /** Text/plain content — multipart walks parts, keeps text/plain
    * (`modules/validator.py:93-101`). */
  def textPlain(raw: String): String = {
    val ctype = headerOf(raw, "Content-Type").getOrElse("text/plain")
    if (ctype.startsWith("multipart/")) {
      val boundary = "boundary=\"?([^\";\\s]+)\"?".r.findFirstMatchIn(ctype)
        .map(_.group(1)).getOrElse(return "")
      raw.split(java.util.regex.Pattern.quote("--" + boundary), -1).toSeq
        .drop(1).dropRight(1)
        .flatMap { part =>
          val p = part.stripPrefix("\n")
          val idx = p.indexOf("\n\n")
          if (idx < 0) None
          else {
            val (head, body) = (p.substring(0, idx), p.substring(idx + 2))
            if (head.toLowerCase.contains("text/plain"))
              Some(body.stripSuffix("\n"))
            else None
          }
        }.mkString("\n")
    } else {
      val idx = raw.indexOf("\n\n")
      if (idx < 0) "" else raw.substring(idx + 2).stripSuffix("\n")
    }
  }
}
