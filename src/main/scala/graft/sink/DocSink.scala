package graft.sink

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** S8 — one output file per row. Not a native DataFrame write mode, so it is
  * a `foreachPartition` sink (executor-side IO, outside the planner —
  * SURVEY.md §2.1 S8/S10/S12/S14). Paths must be visible to every executor
  * (local FS in local mode; a shared mount/DFS on a cluster).
  */
object DocSink {

  /** Write `textCol` of each row to `dir/<filenameCol>` (UTF-8). */
  def writeTextFiles(df: DataFrame, dir: String,
                     filenameCol: String = "filename",
                     textCol: String = "text"): Unit = {
    Files.createDirectories(Paths.get(dir))
    val data = df.select(filenameCol, textCol)
    data.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        val name = r.getString(0)
        val text = r.getString(1)
        if (name != null && text != null)
          Files.write(Paths.get(dir, name),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  /** Write binary `bytesCol` of each row to `dir/<filenameCol>`. */
  def writeBinaryFiles(df: DataFrame, dir: String,
                       filenameCol: String, bytesCol: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val data = df.select(filenameCol, bytesCol)
    data.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        val name = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (name != null && bytes != null)
          Files.write(Paths.get(dir, name), bytes)
      }
    }
  }
}
