package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._

/** On-disk format compatibility (review findings, round 5):
  *
  *   - the declared-schema read fast path must not FABRICATE count
  *     columns over a level written without them — the legacy detection
  *     (counts-approx marker, exact-count substitution gate) relies on
  *     the columns being genuinely absent;
  *   - the bucket layout (slots per tb directory) is baked into every
  *     partition path, so it is persisted per store (`_layout`) and
  *     probed for pre-marker stores — a binary with a different default
  *     must not silently mis-prune an existing store's directories.
  */
class StoreFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Now = 1706659200L

  test("level without count columns reads without them; update marks counts approx") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-legacy").toString
    val store = new MetricStore(spark, root, numBuckets = 4)
    store.create("m",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    // hand-write a LEGACY level_1 (pre-count schema: no known/vsum)
    val legacy = Seq(("m", w0, 12.0)).toDF("metric", "interval", "value")
      .withColumn("pb", pmod(hash(col("metric")), lit(4)))
      .withColumn("tb", expr(s"interval div ${store.bucketSeconds(300)}"))
    legacy.write.partitionBy("pb", "tb").parquet(s"$root/level_1")

    val reopened = new MetricStore(spark, root, numBuckets = 4)
    // the probe must expose the true on-disk schema, not the declared one
    assert(!reopened.levelData(1).columns.contains("vsum"),
      s"fabricated count columns: ${reopened.levelData(1).columns.toSeq}")
    assert(reopened.countsExact) // nothing degraded yet

    // an ingest cascading into the legacy level must record the mix
    val pts = (0 until 5).map(i => ("m", w0 + i * 60L, 10.0 + i, i.toLong))
    reopened.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    assert(!reopened.countsExact,
      "merging counted rows into a legacy level must mark counts approx")
  }

  test("fresh store stamps its bucket layout; pre-marker 8192 store is probed") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-layout").toString
    val store = new MetricStore(spark, root, numBuckets = 4)
    store.create("m", RetentionPolicy(Seq(ArchiveInfo(60, 50000)), xff = 0f))
    val t0 = Now - Now % 60 - 600
    store.updateMany(
      Seq(("m", t0, 1.5, 0L)).toDF("metric", "ts", "value", "seq"), Now)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/_layout")).trim ==
      "bucket_slots=1024\nnum_buckets=4")

    // hand-build a PRE-MARKER store whose level_0 dirs follow the old
    // 8192-slot layout; opening it must probe 8192 and still fetch
    val root2 = Files.createTempDirectory("ms-layout8k").toString
    val s2 = new MetricStore(spark, root2, numBuckets = 4)
    s2.create("m", RetentionPolicy(Seq(ArchiveInfo(60, 50000)), xff = 0f))
    Seq(("m", t0, 7.5)).toDF("metric", "interval", "value")
      .withColumn("pb", pmod(hash(col("metric")), lit(4)))
      .withColumn("tb", expr(s"interval div ${60L * 8192L}"))
      .write.partitionBy("pb", "tb").parquet(s"$root2/level_0")

    val reopened = new MetricStore(spark, root2, numBuckets = 4)
    assert(reopened.bucketSeconds(60) == 60L * 8192L,
      "pre-marker 8192-layout store was not probed")
    val vals = reopened.fetch("m", t0 - 60, t0 + 60, Now).get.values
    assert(vals.flatten.contains(7.5), s"old-layout point lost: $vals")
    // and the probe result is now stamped for future opens
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root2/_layout")).trim ==
      "bucket_slots=8192\nnum_buckets=4")
  }

  test("a pre-marker store matching no known layout is refused, not guessed") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-layout-bad").toString
    val s = new MetricStore(spark, root, numBuckets = 4)
    s.create("m", RetentionPolicy(Seq(ArchiveInfo(60, 50000)), xff = 0f))
    val t0 = Now - Now % 60 - 600
    // tb deliberately inconsistent with every historical layout
    Seq(("m", t0, 7.5)).toDF("metric", "interval", "value")
      .withColumn("pb", pmod(hash(col("metric")), lit(4)))
      .withColumn("tb", lit(999L))
      .write.partitionBy("pb", "tb").parquet(s"$root/level_0")
    val reopened = new MetricStore(spark, root, numBuckets = 4)
    intercept[InvalidConfiguration] { reopened.fetch("m", t0 - 60, t0 + 60, Now) }
  }

  test("bucket COUNT persists: reopening with a different default cannot mis-prune") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-nbpersist").toString
    val store = new MetricStore(spark, root, numBuckets = 4)
    val policy =
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f)
    val metrics = (0 until 6).map(i => s"m$i")
    metrics.foreach(store.create(_, policy))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = metrics.flatMap(m =>
      (0 until 5).map(i => (m, w0 + i * 60L, 10.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    val before = store.fetch("m3", w0, w0 + 300, Now).get.values

    // reopen with the DEFAULT constructor (32 buckets): the persisted
    // layout must win — pb = pmod(hash(metric), 4) is baked into the
    // directory names, so computing buckets mod 32 would prune fetches
    // to the wrong (usually empty) directories and split new writes
    // across two layouts
    val reopened = new MetricStore(spark, root)
    assert(reopened.effectiveBuckets == 4)
    assert(reopened.fetch("m3", w0, w0 + 300, Now).get.values == before)
    // a write through the reopened handle lands in the SAME layout and
    // is visible to the original handle's pruned read
    reopened.updateMany(
      Seq(("m3", w0 + 120L, 99.0, 100L)).toDF("metric", "ts", "value", "seq"), Now)
    val after = store.fetch("m3", w0, w0 + 300, Now).get.values
    assert(after.flatten.contains(99.0), s"reopened write not visible: $after")
  }

  test("level files are ordered by (metric, interval) on fresh AND merged writes") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-fileorder").toString
    val store = new MetricStore(spark, root, numBuckets = 4)
    val policy =
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f)
    val metrics = (0 until 8).map(i => s"m$i")
    metrics.foreach(store.create(_, policy))
    val base = Now - 3000
    val w0 = base - base % 300
    def assertFilesSorted(tag: String): Unit = {
      val files = new java.io.File(root).listFiles
        .filter(f => f.getName.startsWith("level_"))
        .flatMap(l => l.listFiles.filter(_.getName.startsWith("pb=")))
        .flatMap(p => p.listFiles.filter(_.getName.startsWith("tb=")))
        .flatMap(t => t.listFiles.filter(_.getName.endsWith(".parquet")))
      assert(files.nonEmpty, s"$tag: no level files found")
      files.foreach { f =>
        // a single small parquet file is one split → collect preserves
        // the writer's row order, so page/row-group min-max stats for
        // (metric, interval) are monotone iff this is sorted
        val rows = spark.read.parquet(f.getPath)
          .select("metric", "interval").as[(String, Long)].collect.toSeq
        assert(rows == rows.sortBy(identity),
          s"$tag: ${f.getPath} not (metric, interval)-ordered: $rows")
      }
    }
    // fresh path (writeFresh, per-pb fan-out regime: 8 metrics / 4 pbs)
    val pts = metrics.flatMap(m =>
      (0 until 5).map(i => (m, w0 + i * 60L, 10.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    assertFilesSorted("fresh")
    // merged path (writeMerged over the existing level, same dirs)
    val pts2 = metrics.flatMap(m =>
      (0 until 5).map(i => (m, w0 + i * 60L + 60, 20.0 + i, 100L + i)))
    store.updateMany(pts2.toDF("metric", "ts", "value", "seq"), Now)
    assertFilesSorted("merged")
  }
}
