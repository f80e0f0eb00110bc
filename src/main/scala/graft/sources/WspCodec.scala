package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.model._

/** Byte-level codec for the reference's on-disk .wsp format — the
  * migration connector between real whisper trees and the Spark store.
  *
  * Layout (/root/reference/whisper.py:18-26,107-118):
  *   Metadata    !2LfL  = aggregationType:u32, maxRetention:u32,
  *                        xFilesFactor:f32, archiveCount:u32   (16 B)
  *   ArchiveInfo !3L    = offset:u32, secondsPerPoint:u32, points:u32 (12 B each)
  *   Point       !Ld    = interval:u32, value:f64               (12 B)
  * All big-endian. Each archive is a ring: slot of interval t is
  * offset + ((t-base)/step mod points)·12 where base is the interval
  * stored in the archive's FIRST slot (whisper.py:721-724,991-1001).
  * A zeroed slot (interval 0) is empty.
  *
  * Pure JVM (no Spark imports) so it runs inside executors — see
  * [[WspSource.readTree]] for the distributed tree import.
  */
object WspCodec {

  val MetadataSize = 16
  val ArchiveInfoSize = 12
  val PointSize = 12

  /** Total file size for a policy (whisper-create.py:71-72). */
  def fileSize(policy: RetentionPolicy): Long =
    MetadataSize + ArchiveInfoSize.toLong * policy.levels.size +
      PointSize.toLong * policy.levels.map(_.points.toLong).sum

  /** Parse a .wsp image: (policy, per-level points). Level order matches
    * `policy.levels` (finest first); points are (interval, value) sorted
    * by interval, empty slots (interval 0) skipped. Corruption checks
    * mirror __readHeader (whisper.py:289-298).
    */
  def readBytes(bytes: Array[Byte], path: String = "<bytes>"): (RetentionPolicy, Seq[Seq[(Long, Double)]]) = {
    if (bytes.length < MetadataSize)
      throw new CorruptWhisperFile("Unable to read header", path)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val aggType = buf.getInt(0)
    val maxRetention = buf.getInt(4).toLong & 0xffffffffL
    val xff = buf.getFloat(8)
    val count = buf.getInt(12)
    if (count <= 0 || bytes.length < MetadataSize + count * ArchiveInfoSize)
      throw new CorruptWhisperFile("Unable to read header", path)
    if (xff.isNaN || xff < 0 || xff > 1)
      throw new CorruptWhisperFile(
        s"Unable to read header: xFilesFactor $xff invalid", path)
    val aggregation = AggregationMethod.fromCode(aggType) // throws if unknown
    val infos = (0 until count).map { i =>
      val base = MetadataSize + i * ArchiveInfoSize
      (buf.getInt(base).toLong & 0xffffffffL, // offset
        buf.getInt(base + 4), // secondsPerPoint
        buf.getInt(base + 8)) // points
    }
    // Structural violations in a truncated/corrupt file must surface as
    // CorruptWhisperFile (the reference wraps all header/point unpack
    // failures, whisper.py:289-298), not raw ByteBuffer index errors.
    val headerEnd = MetadataSize + count.toLong * ArchiveInfoSize
    infos.zipWithIndex.foreach { case ((offset, spp, pts), i) =>
      if (spp <= 0 || pts <= 0 || offset < headerEnd ||
          offset + pts.toLong * PointSize > bytes.length)
        throw new CorruptWhisperFile(
          s"Unable to read archive $i (offset=$offset, points=$pts, file=${bytes.length} B)",
          path)
    }
    val policy =
      try RetentionPolicy(
        infos.map { case (_, spp, pts) => ArchiveInfo(spp, pts) }, xff, aggregation)
      catch {
        case e: WhisperException =>
          throw new CorruptWhisperFile(s"Unable to read header: ${e.getMessage}", path)
      }
    if (policy.maxRetention != maxRetention)
      throw new CorruptWhisperFile(
        s"Unable to read header: maxRetention $maxRetention != derived ${policy.maxRetention}",
        path)
    val levels = infos.map { case (offset, spp, pts) =>
      (0 until pts).flatMap { slot =>
        val p = offset.toInt + slot * PointSize
        val interval = buf.getInt(p).toLong & 0xffffffffL
        if (interval == 0L) None
        else Some((interval, buf.getDouble(p + 4)))
      }.sortBy(_._1)
    }
    (policy, levels)
  }

  def read(path: String): (RetentionPolicy, Seq[Seq[(Long, Double)]]) =
    readBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)

  /** Serialize a policy + per-level points into a .wsp image. Points must
    * lie within each level's retention window (callers export at most
    * `points` slots per level); intervals are aligned down to the level
    * grid; the ring base is each level's minimum aligned interval, so a
    * fresh export never wraps. Later duplicates of a slot win (LWW).
    */
  def writeBytes(policy: RetentionPolicy,
                 levels: Seq[Seq[(Long, Double)]]): Array[Byte] = {
    require(levels.size == policy.levels.size,
      s"${levels.size} level lists for ${policy.levels.size} archives")
    val bytes = new Array[Byte](fileSize(policy).toInt)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, policy.aggregation.code)
    buf.putInt(4, policy.maxRetention.toInt)
    buf.putFloat(8, policy.xff)
    buf.putInt(12, policy.levels.size)
    var offset = MetadataSize + policy.levels.size * ArchiveInfoSize
    policy.levels.zipWithIndex.foreach { case (a, i) =>
      val base = MetadataSize + i * ArchiveInfoSize
      buf.putInt(base, offset)
      buf.putInt(base + 4, a.secondsPerPoint)
      buf.putInt(base + 8, a.points)
      val pts = levels(i).map { case (t, v) =>
        (t - t % a.secondsPerPoint, v)
      }
      if (pts.nonEmpty) {
        val ringBase = pts.map(_._1).min
        pts.foreach { case (t, v) =>
          val slot =
            (((t - ringBase) / a.secondsPerPoint) % a.points + a.points) % a.points
          val p = offset + slot.toInt * PointSize
          buf.putInt(p, t.toInt)
          buf.putDouble(p + 4, v)
        }
      }
      offset += a.size.toInt
    }
    bytes
  }

  def write(path: String, policy: RetentionPolicy,
            levels: Seq[Seq[(Long, Double)]]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      writeBytes(policy, levels))
}
