package graft.model

/** Per-metric retention policy — the Spark-side analog of the whisper file
  * header (Metadata + ArchiveInfo+, /root/reference/whisper.py:276-328).
  *
  * `xff` is stored as Float deliberately: the reference packs xFilesFactor
  * as an IEEE f32 and its tests assert the f32 precision quirk
  * (0.2 → 0.20000000298023224, /root/reference/test_whisper.py:630-633).
  */
final case class RetentionPolicy(
    archives: Seq[ArchiveInfo],
    xff: Float = 0.5f,                                      // whisper.py:492
    aggregation: AggregationMethod = AggregationMethod.default // whisper.py:494
) {
  if (xff.isNaN || xff < 0 || xff > 1)
    throw new InvalidXFilesFactor(s"Invalid xFilesFactor $xff, not between 0 and 1")

  /** Sorted finest-first and invariant-checked (whisper.py:421-476). */
  val levels: Seq[ArchiveInfo] = Retention.validateArchiveList(archives)

  /** Longest history any level retains (whisper.py:404). */
  def maxRetention: Long = levels.map(_.retention).max

  /** Highest-precision level index whose retention covers a point of the
    * given age, i.e. the write-routing rule of whisper.py:699-704,767-784.
    * Returns None when the point is older than total retention.
    */
  def levelForAge(ageSeconds: Long): Option[Int] = {
    val i = levels.indexWhere(_.retention >= ageSeconds)
    if (i < 0) None else Some(i)
  }

  /** Finest level able to answer a query reaching back to `age` seconds
    * (fetch archive selection, whisper.py:947-954).
    */
  def levelForQueryAge(ageSeconds: Long): Int = {
    val i = levels.indexWhere(_.retention >= ageSeconds)
    if (i < 0) levels.size - 1 else i
  }

  /** Explicit granularity selection (fetch archiveToSelect,
    * whisper.py:943-957).
    */
  def levelForPrecision(precision: Int): Int = {
    val i = levels.indexWhere(_.secondsPerPoint == precision)
    if (i < 0) throw new IllegalArgumentException(s"Invalid granularity: $precision")
    i
  }
}

object RetentionPolicy {
  def parse(spec: String,
            xff: Float = 0.5f,
            aggregation: AggregationMethod = AggregationMethod.default): RetentionPolicy =
    RetentionPolicy(Retention.parseSchema(spec), xff, aggregation)
}
