package graft.ops

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Debug instrumentation: whisper's enableDebug/disableDebug wrap `open`
  * to count and print read/write operations
  * (/root/reference/whisper.py:225-273). The Spark analog is a listener
  * over task metrics: records/bytes in and out, engine-wide.
  */
object Debug {

  final case class IoStats(
      readRecords: Long, readBytes: Long,
      writtenRecords: Long, writtenBytes: Long)

  private val readRecords = new LongAdder
  private val readBytes = new LongAdder
  private val writtenRecords = new LongAdder
  private val writtenBytes = new LongAdder
  @volatile private var listener: Option[SparkListener] = None

  def enableDebug(spark: SparkSession): Unit = synchronized {
    if (listener.isEmpty) {
      val l = new SparkListener {
        override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
          val m = taskEnd.taskMetrics
          if (m != null) {
            readRecords.add(m.inputMetrics.recordsRead)
            readBytes.add(m.inputMetrics.bytesRead)
            writtenRecords.add(m.outputMetrics.recordsWritten)
            writtenBytes.add(m.outputMetrics.bytesWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      listener = Some(l)
    }
  }

  def disableDebug(spark: SparkSession): Unit = synchronized {
    listener.foreach(spark.sparkContext.removeSparkListener)
    listener = None
    reset()
  }

  def reset(): Unit = {
    readRecords.reset(); readBytes.reset()
    writtenRecords.reset(); writtenBytes.reset()
  }

  def stats(): IoStats =
    IoStats(readRecords.sum(), readBytes.sum(), writtenRecords.sum(), writtenBytes.sum())

  /** whisper prints "%d woots" per op; we print a summary on demand. */
  def printStats(): Unit = {
    val s = stats()
    println(s"[debug] read ${s.readRecords} records (${s.readBytes} B), " +
      s"wrote ${s.writtenRecords} records (${s.writtenBytes} B)")
  }
}
