package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Review scratch: does substitution preserve a WHERE below the aggregate? */
class FilterDropReviewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  test("filtered window aggregate keeps its filter after substitution") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-filterdrop").toString, numBuckets = 4)
    store.create("m1",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    store.create("m2",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).flatMap(i => Seq(
      ("m1", w0 + i * 60L, 10.0 + i, i.toLong),
      ("m2", w0 + i * 60L, 100.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("metric") === "m1")
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      val metrics = q.select("metric").distinct().as[String].collect().toSet
      info(s"metrics in result: $metrics")
      assert(metrics == Set("m1"), s"WHERE metric='m1' was dropped: got $metrics")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
