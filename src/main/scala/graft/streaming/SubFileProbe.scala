package graft.streaming

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.{ColumnIOFactory, DelegatingSeekableInputStream, InputFile, SeekableInputStream}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.util.LongAccumulator

/** Row-group/page-level probe reads over the occurrence store's SORTED
  * sub-bucket files — [[OccStateStore.readPruned]]'s FOURTH pruning tier
  * (r13 verdict item 1: sub-files are written sorted by shingle, but the
  * r13 reader opened them WHOLE, so the probe's bytes were bound below by
  * file granularity and the only way to sharpen reads was to multiply
  * files — the 131,072-file serve layout).
  *
  * Why this cannot be a plain pushed-down DataFrame filter: the probe
  * wants, PER FILE, "only the rows of MY keys that route here" — but one
  * `spark.read.parquet(paths).filter(isin(allBatchKeys))` scan carries ONE
  * global predicate, and bucket/sub routing is a hash of the key, so every
  * file's shingle RANGE interleaves every other file's in key space: a
  * row-group (or page) min/max test against the global key set almost
  * always intersects, and no row group is ever skipped (the same argument
  * kills a pushed-In: Spark collapses large In sets to a min/max range).
  * Parquet CAN evaluate a per-file predicate against its row-group
  * statistics and (since the column-index era) its per-PAGE min/max — it
  * just has to be a DIFFERENT predicate per file, which Spark's scan node
  * cannot express. So this reader distributes (file, its own few keys)
  * pairs and opens each file with parquet-hadoop directly:
  *
  *  - row groups are admitted by the file's OWN tiny or-of-eq predicate
  *    against row-group statistics ([[ParquetFileReader]] filters blocks
  *    at open);
  *  - within an admitted row group, `readNextFilteredRowGroup()` applies
  *    the COLUMN INDEX (per-page min/max over the sorted shingle column —
  *    written by parquet by default, made selective by the writer's
  *    [[OccStateStore]] page-row bound), so a key reads ~one page, not
  *    the whole group;
  *  - record-level assembly applies the same predicate, so the emitted
  *    rows are EXACTLY the probe keys' state rows (a strict subset of
  *    what the whole-file read returned — sound for every consumer,
  *    which by contract re-filters to its key set anyway).
  *
  * No false negatives: a key present in the file has a row whose shingle
  * EQUALS it, so every stats/page/record test keeps that row — the same
  * one-sidedness argument as [[graft.ops.ZoneIndex]], pinned together
  * with byte accounting by StreamingSpanDedupSpec.
  *
  * Scale shape: one task handles many files serially (the spec list is
  * batch-bounded); bytes actually pulled from storage are counted through
  * a wrapping [[InputFile]], so the serving evidence (`graft.ScaleRun`
  * inc-serve) reports MEASURED read bytes, not file-size sums. */
object SubFileProbe {

  /** One sub-bucket file and the probe keys that route to it (sorted,
    * deduplicated by the planner; typically single digits of keys). */
  final case class FileKeys(path: String, keys: Array[Long])

  /** Per-file key-count bound for building the or-of-eq predicate: past
    * it the file reads UNFILTERED (the correct-superset degradation — at
    * that key density the whole file is wanted anyway and a thousands-deep
    * predicate tree only burns CPU per row group). */
  final val MaxFilterKeysPerFile = 512

  private val occSchema = StructType(Seq(
    StructField("shingle", LongType), StructField("occ", LongType)))

  /** Read `specs` exactly: (shingle, occ) rows whose shingle is in the
    * file's key set. `bytesRead`/`filesOpened` accumulate the measured
    * stream bytes (footer + admitted pages) and opened-file count for the
    * caller's evidence; pass freshly created accumulators. */
  def read(spark: SparkSession, specs: Seq[FileKeys],
           bytesRead: LongAccumulator,
           filesOpened: LongAccumulator): DataFrame = {
    if (specs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], occSchema)
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val slices = math.min(specs.length,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    val rows = spark.sparkContext
      .parallelize(specs, slices)
      .mapPartitions { it =>
        val hconf = conf.value
        it.flatMap { fk =>
          filesOpened.add(1L)
          readFile(hconf, fk, bytesRead)
        }
      }
      .map { case (s, o) => Row(s, o) }
    spark.createDataFrame(rows, occSchema)
  }

  /** Balanced or-of-eq over the file's keys (≤ [[MaxFilterKeysPerFile]]);
    * balanced so a few hundred keys never build a recursion-deep
    * right-leaning tree in parquet's filter visitors. None = read all. */
  private def predicateFor(keys: Array[Long]): Option[FilterPredicate] = {
    if (keys.isEmpty || keys.length > MaxFilterKeysPerFile) return None
    val col = FilterApi.longColumn("shingle")
    def build(lo: Int, hi: Int): FilterPredicate =
      if (lo == hi) FilterApi.eq(col, java.lang.Long.valueOf(keys(lo)))
      else {
        val mid = (lo + hi) >>> 1
        FilterApi.or(build(lo, mid), build(mid + 1, hi))
      }
    Some(build(0, keys.length - 1))
  }

  /** A spec's path is the (b, sb) PARTITION DIRECTORY — expand it to its
    * data file(s) (one per writing task; hidden/marker names skipped) and
    * read each with the spec's predicate. */
  private def readFile(conf: Configuration, fk: FileKeys,
                       bytesRead: LongAccumulator): Iterator[(Long, Long)] = {
    val dir = new Path(fk.path)
    val fs = dir.getFileSystem(conf)
    val st = fs.getFileStatus(dir)
    val files =
      if (st.isDirectory)
        fs.listStatus(dir).iterator
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath).toSeq.sortBy(_.getName)
      else Seq(dir)
    files.iterator.flatMap(readOneFile(conf, _, fk.keys, bytesRead))
  }

  private def readOneFile(conf: Configuration, path: Path,
                          keys: Array[Long],
                          bytesRead: LongAccumulator): Iterator[(Long, Long)] = {
    val pred = predicateFor(keys)
    val optsB = HadoopReadOptions.builder(conf, path)
    pred.foreach(p => optsB.withRecordFilter(FilterCompat.get(p)))
    val in: InputFile = new CountingInputFile(
      HadoopInputFile.fromPath(path, conf), bytesRead)
    val reader = new ParquetFileReader(in, optsB.build())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      // getFields-based lookup sidesteps the String/String* getType
      // overload ambiguity under Scala
      def fieldOf(n: String) = fileSchema.getFields.get(
        fileSchema.getFieldIndex(n))
      val requested = new MessageType(fileSchema.getName,
        fieldOf("shingle"), fieldOf("occ"))
      reader.setRequestedSchema(requested)
      val columnIO = new ColumnIOFactory().getColumnIO(requested,
        fileSchema, true)
      val filter = pred.map(FilterCompat.get).getOrElse(FilterCompat.NOOP)
      var pages = reader.readNextFilteredRowGroup()
      while (pages != null) {
        val rr = columnIO.getRecordReader(pages,
          new GroupRecordConverter(requested), filter)
        val n = pages.getRowCount
        var i = 0L
        while (i < n) {
          val g = rr.read()
          if (g != null && !rr.shouldSkipCurrentRecord)
            out += ((g.getLong("shingle", 0), g.getLong("occ", 0)))
          i += 1
        }
        pages = reader.readNextFilteredRowGroup()
      }
    } finally reader.close()
    out.iterator
  }

  /** An [[InputFile]] whose streams count every byte surfaced to the
    * reader (footer, page, dictionary — whatever is actually pulled);
    * [[DelegatingSeekableInputStream]] routes all its read shapes through
    * the wrapped stream's two primitive reads, so counting those two
    * covers everything. */
  private final class CountingInputFile(underlying: HadoopInputFile,
                                        acc: LongAccumulator)
      extends InputFile {
    override def getLength: Long = underlying.getLength
    override def newStream(): SeekableInputStream = {
      val raw = underlying.newStream()
      val counting = new java.io.FilterInputStream(raw) {
        override def read(): Int = {
          val r = raw.read(); if (r >= 0) acc.add(1L); r
        }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val r = raw.read(b, off, len); if (r > 0) acc.add(r.toLong); r
        }
      }
      new DelegatingSeekableInputStream(counting) {
        override def getPos: Long = raw.getPos
        override def seek(newPos: Long): Unit = raw.seek(newPos)
      }
    }
  }

  /** Hadoop Configuration is not Java-serializable; the standard
    * write/readFields envelope, self-contained (the Spark-internal
    * equivalent is private[spark]). */
  private final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    @throws(classOf[IOException])
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    @throws(classOf[IOException])
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }
}
