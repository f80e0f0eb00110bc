package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._

/** Scale-shape smoke: high metric cardinality and a larger batch must not
  * degrade the storage layout. The failure mode this guards is the
  * one-directory-per-metric small-file explosion — at 100 TB the
  * difference between a working store and an unusable one.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  test("1000 metrics / 200k points: files bounded by buckets, not metrics") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-scale").toString, numBuckets = 8)
    val metrics = (0 until 1000).map(i => f"srv$i%04d.cpu")
    store.createAll(metrics,
      RetentionPolicy(Seq(ArchiveInfo(60, 2880), ArchiveInfo(300, 2016)), xff = 0f))

    // 200k points over 2 days, round-robin across metrics (generated
    // distributed — no driver-side point list)
    val pts = spark.range(200000).select(
      concat(lit("srv"), lpad((col("id") % 1000).cast("string"), 4, "0"), lit(".cpu"))
        .as("metric"),
      (lit(Now) - expr("(id div 1000) * 60 % 172800")).as("ts"),
      (col("id") % 97).cast("double").as("value"),
      col("id").as("seq"))
    store.updateMany(pts, Now)

    // level-0 holds every point slot; level-1 rolled up
    assert(store.levelData(0).count() === 200000)
    assert(store.levelData(1).count() > 0)

    // file count must track (pb × tb) partitions — NOT metric count.
    // 8 pb buckets × ceil(2d / 5.7d-bucket) tb values ≈ 8-16 dirs/level,
    // one data file each (writes are clustered); 1000 metrics must not
    // mean 1000+ files.
    def parquetFiles(i: Int): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"${store.root}/level_$i"))
        .count(_.getName.endsWith(".parquet"))
    }
    val files0 = parquetFiles(0)
    assert(files0 <= 64, s"small-file explosion: $files0 files at level 0")

    // single-metric fetch returns only that metric's dense grid
    val Some(res) = store.fetch("srv0042.cpu", Now - 3600, Now, Now)
    assert(res.values.size == 60)
    assert(res.values.flatten.nonEmpty)
  }
}
