package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Regression: a Filter between the Aggregate and the level-0 scan must
  * never be silently dropped (reviewer finding, round 2). Group-commuting
  * predicates (metric, step-aligned interval bounds) are since CARRIED
  * onto the substituted scan — the substitution may fire, but the filter
  * must survive it (FilteredSubstitutionSpec covers the carry matrix);
  * everything else still vetoes the rewrite outright.
  */
class FilterDropReviewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  private def hasAggregate(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  test("metric-filtered aggregate substitutes WITH the filter carried, never dropped") {
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
      // metric is a group key, so the predicate commutes: substitution
      // fires and the filter moves onto the level scan
      assert(!hasAggregate(q),
        s"metric-filtered substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val metrics = q.select("metric").distinct().as[String].collect().toSet
      assert(metrics == Set("m1"), s"WHERE metric='m1' was dropped: got $metrics")
      val got = q.collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 12.0, (w0 + 300) -> 17.0), s"wrong values: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("value-filtered window aggregate is NOT substituted") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-filterdrop2").toString, numBuckets = 4)
    store.create("m1",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("m1", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("value") > 14.5)
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(hasAggregate(q),
        s"filtered aggregate was substituted:\n${q.queryExecution.optimizedPlan}")
      // values 10..19; only 15..19 pass the filter → single window, avg 17
      val got = q.collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map((w0 + 300) -> 17.0), s"filter dropped: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("value-rewriting projection below the aggregate is NOT substituted") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-filterdrop3").toString, numBuckets = 4)
    store.create("m1",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("m1", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0)
        .select(col("metric"), col("interval"), (col("value") * 2).as("value"))
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(hasAggregate(q),
        s"rewritten-value aggregate was substituted:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 24.0, (w0 + 300) -> 34.0), s"projection dropped: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
