package graft.model

/** Sealed error hierarchy mirroring the reference taxonomy
  * (/root/reference/whisper.py:181-222). Messages are kept identical where
  * the reference tests assert exact strings
  * (/root/reference/test_whisper.py:148-151,539-541).
  */
sealed abstract class WhisperException(msg: String) extends RuntimeException(msg)

final class InvalidConfiguration(msg: String) extends WhisperException(msg)

final class InvalidAggregationMethod(msg: String) extends WhisperException(msg)

final class InvalidTimeInterval(msg: String) extends WhisperException(msg)

final class InvalidXFilesFactor(msg: String) extends WhisperException(msg)

final class TimestampNotCovered(msg: String) extends WhisperException(msg)

/** Message format "%s (%s)" matches CorruptWhisperFile.__str__
  * (/root/reference/whisper.py:215-221).
  */
final class CorruptWhisperFile(val error: String, val path: String)
    extends WhisperException(s"$error ($path)")
