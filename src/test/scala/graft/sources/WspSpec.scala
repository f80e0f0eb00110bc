package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** The .wsp binary connector: byte-level format fidelity (golden header
  * for the README example), round trips, ring wraparound, and the
  * store/tree migration paths.
  */
class WspSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Now = 1706659200L

  test("golden header: 60:1440 file is 17,308 bytes with reference offsets") {
    val policy = RetentionPolicy(Seq(ArchiveInfo(60, 1440)))
    val bytes = WspCodec.writeBytes(policy, Seq(Seq.empty))
    assert(bytes.length == 17308) // whisper-create.py:71-72 / README.md:58
    val buf = java.nio.ByteBuffer.wrap(bytes)
    assert(buf.getInt(0) == 1) // average
    assert(buf.getInt(4) == 86400) // maxRetention
    assert(buf.getFloat(8) == 0.5f)
    assert(buf.getInt(12) == 1) // archiveCount
    assert(buf.getInt(16) == 28) // first archive offset = 16 + 12
    assert(buf.getInt(20) == 60) // secondsPerPoint
    assert(buf.getInt(24) == 1440) // points
  }

  test("round trip: multi-archive policy, every aggregation field, LWW slots") {
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 10), ArchiveInfo(300, 10)),
      xff = 0.2f, AggregationMethod.AbsMax)
    val t0 = 1200L
    val fine = Seq((t0, 1.5), (t0 + 60, -2.5), (t0 + 120, 3.0), (t0 + 120, 4.0))
    val coarse = Seq((900L, 7.0))
    val (p2, levels) = WspCodec.readBytes(WspCodec.writeBytes(policy, Seq(fine, coarse)))
    assert(p2.aggregation == AggregationMethod.AbsMax)
    assert(p2.xff == 0.2f) // f32 exact
    assert(p2.levels == policy.levels)
    // duplicate slot: later write wins
    assert(levels(0) == Seq((t0, 1.5), (t0 + 60, -2.5), (t0 + 120, 4.0)))
    assert(levels(1) == coarse)
  }

  test("ring wraparound: writes points%capacity apart land in one slot, later wins") {
    val policy = RetentionPolicy(Seq(ArchiveInfo(60, 5)))
    val pts = Seq((600L, 1.0), (600L + 5 * 60, 2.0)) // same slot after wrap
    val (_, levels) = WspCodec.readBytes(WspCodec.writeBytes(policy, Seq(pts)))
    assert(levels(0) == Seq((900L, 2.0)))
  }

  test("corrupt headers raise CorruptWhisperFile") {
    intercept[CorruptWhisperFile](WspCodec.readBytes(Array[Byte](1, 2, 3)))
    val good = WspCodec.writeBytes(
      RetentionPolicy(Seq(ArchiveInfo(60, 5))), Seq(Seq.empty))
    val badAgg = good.clone(); badAgg(3) = 99 // aggregationType = 99
    intercept[CorruptWhisperFile](WspCodec.readBytes(badAgg))
    val badXff = good.clone()
    java.nio.ByteBuffer.wrap(badXff).putFloat(8, 1.5f)
    intercept[CorruptWhisperFile](WspCodec.readBytes(badXff))
  }

  test("truncated body and structural lies raise CorruptWhisperFile, not raw index errors") {
    val good = WspCodec.writeBytes(
      RetentionPolicy(Seq(ArchiveInfo(60, 5))), Seq(Seq((600L, 1.0))))
    // truncated mid-archive: header intact, point data cut short
    intercept[CorruptWhisperFile](WspCodec.readBytes(good.take(good.length - 7)))
    // archive claims more points than the file holds
    val lyingPoints = good.clone()
    java.nio.ByteBuffer.wrap(lyingPoints).putInt(24, 50000)
    intercept[CorruptWhisperFile](WspCodec.readBytes(lyingPoints))
    // offset pointing into the header
    val lyingOffset = good.clone()
    java.nio.ByteBuffer.wrap(lyingOffset).putInt(16, 4)
    intercept[CorruptWhisperFile](WspCodec.readBytes(lyingOffset))
    // header maxRetention inconsistent with the archive list
    val lyingRetention = good.clone()
    java.nio.ByteBuffer.wrap(lyingRetention).putInt(4, 12345)
    intercept[CorruptWhisperFile](WspCodec.readBytes(lyingRetention))
    // zero secondsPerPoint
    val zeroStep = good.clone()
    java.nio.ByteBuffer.wrap(zeroStep).putInt(20, 0)
    intercept[CorruptWhisperFile](WspCodec.readBytes(zeroStep))
  }

  test("importFile preserves coarse-archive history beyond fine retention") {
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 10), ArchiveInfo(300, 20)), xff = 0f)
    // coarse-only history: 5000s old, far beyond the fine level's 600s
    val oldInterval = (Now - 5000) - (Now - 5000) % 300
    val recent = (Now - 300) - (Now - 300) % 60
    val wsp = Files.createTempDirectory("wsp-import").resolve("m.wsp").toString
    WspCodec.write(wsp, policy,
      Seq(Seq((recent, 1.0)), Seq((oldInterval, 42.0), (recent - recent % 300, 1.0))))

    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-wsp").toString, numBuckets = 4)
    val imported = WspSource.importFile(store, "a.b.m", wsp)
    assert(imported == policy)
    // coarse history must be queryable (fetch selects the coarse level
    // for a range reaching past fine retention)
    val Some(res) = store.fetch("a.b.m", oldInterval - 1, oldInterval + 300, Now)
    assert(res.values.flatten == Seq(42.0))
  }

  test("export → import round trip through a store") {
    import spark.implicits._
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f)
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-wsp-exp").toString, numBuckets = 4)
    store.create("m", policy)
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("m", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    val wsp = Files.createTempDirectory("wsp-exp").resolve("m.wsp").toString
    WspSource.exportFile(store, "m", wsp, Now)

    val store2 = new MetricStore(
      spark, Files.createTempDirectory("ms-wsp-imp").toString, numBuckets = 4)
    WspSource.importFile(store2, "m", wsp)
    for (lvl <- 0 to 1) {
      def dump(s: MetricStore) = s.levelData(lvl).collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(dump(store2) == dump(store), s"level $lvl diverged")
    }
  }

  test("distributed tree import: carbon path naming, per-level fidelity") {
    val policy = RetentionPolicy(Seq(ArchiveInfo(60, 10)), xff = 0f)
    val root = Files.createTempDirectory("wsp-tree")
    Files.createDirectories(root.resolve("sys/cpu"))
    val t = Now - Now % 60
    WspCodec.write(root.resolve("sys/cpu/user.wsp").toString, policy,
      Seq(Seq((t - 60, 1.0), (t, 2.0))))
    WspCodec.write(root.resolve("sys/load.wsp").toString, policy,
      Seq(Seq((t, 9.0))))

    val df = WspSource.readTree(spark, root.toString)
    val rows = df.collect().map(r => (r.getAs[String]("metric"),
      r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
    assert(rows == Set(
      ("sys.cpu.user", t - 60, 1.0), ("sys.cpu.user", t, 2.0),
      ("sys.load", t, 9.0)))

    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-tree").toString, numBuckets = 4)
    val metrics = WspSource.importTree(store, root.toString)
    assert(metrics == Seq("sys.cpu.user", "sys.load"))
    val Some(res) = store.fetch("sys.cpu.user", t - 121, t, Now)
    assert(res.values.flatten == Seq(1.0, 2.0))
  }
}
