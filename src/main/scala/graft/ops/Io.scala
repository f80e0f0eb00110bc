package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table access for the driver's parquet fixtures.
  *
  * The fixtures carry TIMESTAMP(NANOS) columns, which Spark 4 rejects
  * unless `spark.sql.legacy.parquet.nanosAsLong` is set — we set it
  * defensively per read (it is a runtime SQL conf) so queries work under
  * any session the driver builds, and normalize either representation to
  * epoch seconds via `tsec`.
  */
object Io {

  def readTable(s: SparkSession, dir: String, name: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Pushdown-friendly range predicate: compares the NATIVE column
    * against a literal of its own type, so the filter reaches the
    * parquet scan (a `cast(ts).cast(long) < x` chain only pushes
    * IsNotNull — Catalyst can't invert casts through the source).
    */
  def tsBefore(df: DataFrame, colName: String, epochSec: Long): Column =
    df.schema(colName).dataType match {
      case LongType => col(colName) < lit(epochSec * 1000000000L)
      case TimestampType =>
        col(colName) < lit(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epochSec)))
      case TimestampNTZType =>
        col(colName) < lit(java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC))
      case other =>
        throw new IllegalArgumentException(s"unexpected type for $colName: $other")
    }

  /** Epoch-seconds (floor) from a `ts` column that is either LongType
    * nanoseconds (nanosAsLong read) or a TimestampType. Integer `div`
    * keeps full precision — a double division would lose bits above 2^53.
    */
  def tsec(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case LongType => expr(s"$colName div 1000000000")
      case TimestampType => col(colName).cast("long")
      // micros-precision NTZ (session TZ is UTC, so NTZ == instant here)
      case TimestampNTZType => col(colName).cast("timestamp").cast("long")
      case other =>
        throw new IllegalArgumentException(s"unexpected type for $colName: $other")
    }
}
