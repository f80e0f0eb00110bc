package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Round-3 advice regressions for the substitution rule:
  *  - a composite output (round/arith wrapping a kernel) must NOT match —
  *    substituting the raw rollup value would drop the wrapper;
  *  - Average at level >= 2 is an avg-of-avgs in the store cascade and
  *    must not replace a true level-0 average (cascade-exact kernels like
  *    Sum still substitute at depth);
  *  - a store with heterogeneous per-metric policies must not substitute
  *    at all (the level dirs mix metrics with different policies).
  */
class AdviceR3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  private def hasAggregate(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  test("composite agg outputs (round/avg+1) are not treated as kernels") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-adv-comp").toString, numBuckets = 4)
    store.create("m",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("m", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    RollupSubstitution.register(spark, store)
    try {
      val l0 = store.levelData(0).select("metric", "interval", "value")
      val grouped = l0.groupBy(col("metric"),
        (col("interval") - col("interval") % lit(300L)).as("interval"))

      // avg+1: numeric divergence if the wrapper were dropped
      val plusOne = grouped.agg((avg(col("value")) + lit(1.0)).as("value"))
      assert(hasAggregate(plusOne),
        s"composite avg+1 was wrongly substituted:\n${plusOne.queryExecution.optimizedPlan}")
      val got = plusOne.orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 13.0, (w0 + 300) -> 18.0))

      // round(avg, 2): same shape, different wrapper
      val rounded = grouped.agg(round(avg(col("value")), 2).as("value"))
      assert(hasAggregate(rounded),
        s"composite round(avg) was wrongly substituted:\n${rounded.queryExecution.optimizedPlan}")

      // window() shape with a composite kernel
      val win = l0
        .withColumn("ts", timestamp_seconds(col("interval")))
        .groupBy(col("metric"), window(col("ts"), "300 seconds"))
        .agg((avg(col("value")) + lit(1.0)).as("value"))
      assert(hasAggregate(win),
        s"window-shape composite was wrongly substituted:\n${win.queryExecution.optimizedPlan}")

      // sanity: the bare kernel still substitutes
      val bare = grouped.agg(avg(col("value")).as("value"))
      assert(!hasAggregate(bare),
        s"bare kernel no longer substitutes:\n${bare.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("deep Average substitutes via vsum/known (true avg, not avg-of-avgs); Sum too") {
    val levels3 = Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 120), ArchiveInfo(1800, 48))
    // sparse: 5 points in one 300s subwindow, 1 in another → the cascaded
    // level-2 average is (12+100)/2 = 56, the true level-0 average is
    // (10+11+12+13+14+100)/6 = 26.666…
    def mkStore(name: String, agg: AggregationMethod): (MetricStore, Long) = {
      val store = new MetricStore(
        spark, Files.createTempDirectory(s"ms-adv-$name").toString, numBuckets = 4)
      store.create("m", RetentionPolicy(levels3, xff = 0f, agg))
      val w0 = (Now - 4000) / 1800 * 1800
      val pts = ((0 until 5).map(i => ("m", w0 + i * 60L, 10.0 + i)) :+
        ("m", w0 + 300L, 100.0)).zipWithIndex
        .map { case ((m, t, v), i) => (m, t, v, i.toLong) }
      store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
      (store, w0)
    }

    val (avgStore, w0) = mkStore("avg3", AggregationMethod.Average)
    RollupSubstitution.register(spark, avgStore)
    try {
      val l0 = avgStore.levelData(0).select("metric", "interval", "value")
      val deep = l0.groupBy(col("metric"),
          (col("interval") - col("interval") % lit(1800L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      // the level-2 table carries exact contribution counts, so the scan
      // substitutes — and must return vsum/known (the TRUE level-0
      // average), never the stored avg-of-avgs value
      assert(!hasAggregate(deep),
        s"deep Average with exact counts should substitute:\n${deep.queryExecution.optimizedPlan}")
      val Array(row) = deep.collect()
      assert(math.abs(row.getAs[Double]("value") - 160.0 / 6) < 1e-9)
      // the cascaded level-2 row really is different — the divergence is real
      val l2 = avgStore.levelData(2).where(col("interval") === w0).collect()
      assert(l2.length == 1 && l2.head.getAs[Double]("value") == 56.0)

      // level 1 (first rollup) still substitutes for Average
      val shallow = l0.groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(!hasAggregate(shallow),
        s"level-1 Average no longer substitutes:\n${shallow.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil

    val (sumStore, _) = mkStore("sum3", AggregationMethod.Sum)
    RollupSubstitution.register(spark, sumStore)
    try {
      val l0 = sumStore.levelData(0).select("metric", "interval", "value")
      val deepSum = l0.groupBy(col("metric"),
          (col("interval") - col("interval") % lit(1800L)).as("interval"))
        .agg(sum(col("value")).as("value"))
      assert(!hasAggregate(deepSum),
        s"deep Sum (cascade-exact) should substitute:\n${deepSum.queryExecution.optimizedPlan}")
      val Array(srow) = deepSum.collect()
      assert(srow.getAs[Double]("value") == 160.0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("heterogeneous per-metric policies disable substitution") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-adv-hetero").toString, numBuckets = 4)
    val lv = Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300))
    store.create("a", RetentionPolicy(lv, xff = 0f, AggregationMethod.Average))
    store.create("b", RetentionPolicy(lv, xff = 0f, AggregationMethod.Sum))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).flatMap(i =>
      Seq(("a", w0 + i * 60L, 10.0 + i), ("b", w0 + i * 60L, 10.0 + i)))
      .zipWithIndex.map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    RollupSubstitution.register(spark, store)
    try {
      // an avg query matches metric a's policy but the level scan holds
      // b's sum rows too — substitution must not fire for either kernel
      val l0 = store.levelData(0).select("metric", "interval", "value")
      val grouped = l0.groupBy(col("metric"),
        (col("interval") - col("interval") % lit(300L)).as("interval"))
      val q1 = grouped.agg(avg(col("value")).as("value"))
      val q2 = grouped.agg(sum(col("value")).as("value"))
      assert(hasAggregate(q1),
        s"avg over a mixed-policy store was substituted:\n${q1.queryExecution.optimizedPlan}")
      assert(hasAggregate(q2),
        s"sum over a mixed-policy store was substituted:\n${q2.queryExecution.optimizedPlan}")
      // true aggregates still come back correct
      val got = q1.where(col("metric") === "a").orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 12.0, (w0 + 300) -> 17.0))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
