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

  /** Publish `body` at `path` via a sibling tmp file + rename, so a
    * concurrent reader never observes a torn artifact (rename is atomic
    * on HDFS; on stores where it is copy-based the exposure window is
    * the rename, never the byte-by-byte write). */
  def writeAtomic(spark: SparkSession, path: Path, body: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    write(spark, tmp, body)
    if (f.exists(path)) f.delete(path, false)
    require(f.rename(tmp, path), s"artifact rename failed: $tmp -> $path")
  }
}
