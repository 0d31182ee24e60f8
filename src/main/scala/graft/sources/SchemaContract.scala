package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** Ingest-time schema contracts: pin the (column → type) shape a reader
  * depends on and fail LOUDLY, naming every violation, when the upstream
  * data drifts — the generalization of the lesson the round-4 events
  * regeneration taught (`ops/EventTime`): a silent type change upstream
  * degrades queries quietly (wrong casts, dropped rows, null floods)
  * unless something at the read boundary names the drift the moment it
  * lands. At 100 TB the upstream is a fleet of producers you don't
  * control; a contract check is one schema object comparison — zero data
  * cost — so it belongs in front of every pipeline read. */
object SchemaContract {

  /** Require `df` to carry every pinned column at exactly the pinned
    * type (extra columns are allowed — additive evolution is fine).
    * Throws [[IllegalStateException]] listing ALL violations at once,
    * with the table name, so the failure message is the fix list. */
  def requirePinned(df: DataFrame, table: String,
                    pins: (String, DataType)*): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val problems = pins.flatMap { case (name, dt) =>
      actual.get(name) match {
        case None => Some(s"$table.$name is MISSING (expected $dt)")
        case Some(a) if a != dt =>
          Some(s"$table.$name drifted to $a (expected $dt)")
        case _ => None
      }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      s"schema drift detected on '$table':\n  " + problems.mkString("\n  ") +
        "\n— regenerate the data, update the pins, or adapt the reader " +
        "(see graft.ops.EventTime for the adaptive-reader pattern)")
  }
}
