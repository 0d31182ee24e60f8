package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ONE small-text-artifact IO helper over Hadoop FileSystem (local/HDFS/
  * S3A alike) — [[graft.streaming.OccStateStore]]'s meta + manifests and
  * [[graft.ops.VectorIndex]]'s index meta all read/write tiny UTF-8
  * control files; r11 review flagged three private copies of the same
  * open/read/close + create/write/close pattern, so the idiom lives here
  * once (including the tmp+rename publish only the manifest writer had). */
private[graft] object FsText {

  def fs(spark: SparkSession, path: Path): FileSystem =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(spark: SparkSession, path: Path): String = {
    val in = fs(spark, path).open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Overwrite-create `path` with `body` (UTF-8). */
  def write(spark: SparkSession, path: Path, body: String): Unit = {
    val out = fs(spark, path).create(path, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Publish `body` at `path` via a sibling tmp file + rename-with-
    * OVERWRITE, so a concurrent reader never observes a torn OR ABSENT
    * artifact (rename is atomic on HDFS; on stores where it is copy-based
    * the exposure window is the rename, never the byte-by-byte write).
    * The overwrite rename goes through [[org.apache.hadoop.fs.FileContext]]
    * because `FileSystem.rename(src, dst)` refuses an existing `dst` —
    * the r11 delete-then-rename fallback left a window where the path did
    * not exist on the REWRITE path (manifest replay), weaker than this
    * scaladoc's claim (r11 advice). Schemes without a FileContext
    * implementation fall back to delete+rename, losing only the
    * rewrite-window guarantee first publication never needed. */
  def writeAtomic(spark: SparkSession, path: Path, body: String): Unit = {
    val f = fs(spark, path)
    val qualified = f.makeQualified(path)
    val tmp = new Path(qualified.getParent, qualified.getName + ".tmp")
    write(spark, tmp, body)
    try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(qualified.toUri,
          spark.sparkContext.hadoopConfiguration)
        .rename(tmp, qualified,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException |
           _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (f.exists(qualified)) f.delete(qualified, false)
        require(f.rename(tmp, qualified),
          s"artifact rename failed: $tmp -> $qualified")
    }
  }
}
