package graft.model

/** `info()` surface: the whisper header materialized as rows
  * (/root/reference/whisper.py:878-889; offsets laid out as in `create`,
  * whisper.py:504-516: data begins at 16 + 12·n and each archive's ring
  * follows the previous).
  */
object Header {

  final case class LevelInfo(
      level: Int,
      secondsPerPoint: Long,
      points: Long,
      retention: Long,
      offset: Long)

  def infoRows(policy: RetentionPolicy): Seq[LevelInfo] = {
    val n = policy.levels.size
    var offset = 16L + 12L * n
    policy.levels.zipWithIndex.map {
      case (a, i) =>
        val row = LevelInfo(i, a.secondsPerPoint.toLong, a.points.toLong, a.retention, offset)
        offset += a.size
        row
    }
  }
}
