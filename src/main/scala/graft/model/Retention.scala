package graft.model

/** Archive level spec: (secondsPerPoint, points) with derived fields,
  * mirroring ArchiveInfo (/root/reference/whisper.py:117-118,305-315).
  */
final case class ArchiveInfo(secondsPerPoint: Int, points: Int) {
  require(secondsPerPoint > 0 && points > 0, "secondsPerPoint and points must be positive")
  /** Total seconds of history this level holds. */
  def retention: Long = secondsPerPoint.toLong * points
  /** On-disk size of the reference's ring (12 B/point); kept for the size model. */
  def size: Long = points.toLong * 12
}

object Retention {

  /** whisper.py:145-152 */
  val UnitMultipliers: Map[String, Long] = Map(
    "seconds" -> 1L,
    "minutes" -> 60L,
    "hours"   -> 3600L,
    "days"    -> 86400L,
    "weeks"   -> 86400L * 7,
    "years"   -> 86400L * 365
  )

  private val unitOrder = Seq("seconds", "minutes", "hours", "days", "weeks", "years")

  /** Prefix unit match: "s"/"sec"→seconds, "m"/"min"→minutes, …
    * (whisper.py:147-151). Throws on unknown prefix.
    */
  def getUnitString(s: String): String =
    unitOrder
      .find(_.startsWith(s))
      .getOrElse(throw new IllegalArgumentException(s"Invalid unit '$s'"))

  private val withUnitRe = "^(\\d+)([a-z]+)$".r

  /** Parse one `"precision:points"` retention definition
    * (whisper.py:152-178). Both sides accept a unit suffix; a suffixed
    * points side means "this much wall time" and is divided by precision.
    */
  def parseRetentionDef(retentionDef: String): ArchiveInfo = {
    val trimmed = retentionDef.trim
    val idx = trimmed.indexOf(':')
    if (idx < 0)
      throw new IllegalArgumentException(s"Invalid retention definition '$retentionDef'")
    val (precisionStr, pointsStr) = (trimmed.substring(0, idx), trimmed.substring(idx + 1))

    val precision: Long =
      if (precisionStr.nonEmpty && precisionStr.forall(_.isDigit)) precisionStr.toLong
      else
        precisionStr match {
          case withUnitRe(n, unit) => n.toLong * UnitMultipliers(getUnitString(unit))
          case _ =>
            throw new IllegalArgumentException(
              s"Invalid precision specification '$precisionStr'")
        }

    val points: Long =
      if (pointsStr.nonEmpty && pointsStr.forall(_.isDigit)) pointsStr.toLong
      else
        pointsStr match {
          case withUnitRe(n, unit) =>
            n.toLong * UnitMultipliers(getUnitString(unit)) / precision
          case _ =>
            throw new IllegalArgumentException(
              s"Invalid retention specification '$pointsStr'")
        }

    ArchiveInfo(precision.toInt, points.toInt)
  }

  /** Parse a full schema like "1s:1d,1m:7d,1h:5y". */
  def parseSchema(spec: String): Seq[ArchiveInfo] =
    spec.split(',').toSeq.map(parseRetentionDef)

  /** The five archive-list invariants of validateArchiveList
    * (whisper.py:421-476), with the reference's exact message shapes.
    * Returns the list sorted by precision (finest first), as the reference
    * sorts in place.
    */
  def validateArchiveList(archiveList: Seq[ArchiveInfo]): Seq[ArchiveInfo] = {
    if (archiveList.isEmpty)
      throw new InvalidConfiguration("You must specify at least one archive configuration!")

    val sorted = archiveList.sortBy(_.secondsPerPoint)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        val i = sorted.indexOf(a)
        if (a.secondsPerPoint >= b.secondsPerPoint)
          throw new InvalidConfiguration(
            "A Whisper database may not be configured having two archives with " +
              s"the same precision (archive$i: (${a.secondsPerPoint}, ${a.points}), " +
              s"archive${i + 1}: (${b.secondsPerPoint}, ${b.points}))")
        if (b.secondsPerPoint % a.secondsPerPoint != 0)
          throw new InvalidConfiguration(
            "Higher precision archives' precision must evenly divide all lower " +
              s"precision archives' precision (archive$i: ${a.secondsPerPoint}, " +
              s"archive${i + 1}: ${b.secondsPerPoint})")
        if (b.retention <= a.retention)
          throw new InvalidConfiguration(
            "Lower precision archives must cover larger time intervals than higher " +
              s"precision archives (archive$i: ${a.retention} seconds, " +
              s"archive${i + 1}: ${b.retention} seconds)")
        val pointsPerConsolidation = b.secondsPerPoint / a.secondsPerPoint
        if (a.points < pointsPerConsolidation)
          throw new InvalidConfiguration(
            "Each archive must have at least enough points to consolidate to the " +
              s"next archive (archive${i + 1} consolidates $pointsPerConsolidation of " +
              s"archive$i's points but it has only ${a.points} total points)")
      case _ => () // single archive
    }
    sorted
  }

  /** Reference on-disk size model: 16 B metadata + 12 B per archive header
    * + 12 B per point (/root/reference/bin/whisper-create.py:71-72).
    */
  def estimateFileSize(archives: Seq[ArchiveInfo]): Long =
    16L + archives.size * 12L + archives.map(_.size).sum

  /** Disk usage rounded up to whole 4 KiB blocks (whisper-create.py:72). */
  def estimateDiskSize(archives: Seq[ArchiveInfo]): Long = {
    val sz = estimateFileSize(archives)
    math.ceil(sz / 4096.0).toLong * 4096
  }
}
