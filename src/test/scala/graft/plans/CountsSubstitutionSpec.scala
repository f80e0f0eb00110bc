package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Contribution counts (known/vsum) and the cascade-divergence marker:
  *  - the cascade maintains exact per-window level-0 counts at every
  *    depth (vsum/known == true sum/count, even though `value` is
  *    whisper's avg-of-avgs);
  *  - the gated shape may OUTPUT the count and still substitute, served
  *    from the stored known;
  *  - writers that break the "levels == cascade of level-0" invariant
  *    (direct coarse-archive routing of too-old points, external rollup
  *    upserts, transformValues) disable substitution entirely;
  *  - writers that only break count exactness degrade deep Average
  *    substitution but keep the rest.
  */
class CountsSubstitutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L
  private val levels3 =
    Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 120), ArchiveInfo(1800, 48))

  private def hasAggregate(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  /** sparse 3-level Average store: 5 points in one 300s subwindow plus 1
    * in another → avg-of-avgs (56) != true average (160/6).
    */
  private def mkSparse(name: String, xff: Float = 0f): (MetricStore, Long) = {
    val store = new MetricStore(
      spark, Files.createTempDirectory(s"ms-cnt-$name").toString, numBuckets = 4)
    store.create("m", RetentionPolicy(levels3, xff, AggregationMethod.Average))
    val w0 = (Now - 4000) / 1800 * 1800
    val pts = ((0 until 5).map(i => ("m", w0 + i * 60L, 10.0 + i)) :+
      ("m", w0 + 300L, 100.0)).zipWithIndex
      .map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    (store, w0)
  }

  test("cascade maintains exact known/vsum at every depth") {
    val (store, w0) = mkSparse("exact")
    val l1 = store.levelData(1).where(col("interval") === w0).collect()
    assert(l1.length == 1)
    assert(l1.head.getAs[Long]("known") == 5L)
    assert(math.abs(l1.head.getAs[Double]("vsum") - 60.0) < 1e-9)
    val l2 = store.levelData(2).where(col("interval") === w0).collect()
    assert(l2.length == 1)
    // value is whisper's avg-of-avgs; counts see through it to level 0
    assert(l2.head.getAs[Double]("value") == 56.0)
    assert(l2.head.getAs[Long]("known") == 6L)
    assert(math.abs(l2.head.getAs[Double]("vsum") - 160.0) < 1e-9)
    assert(store.countsExact && store.rollupsDerivedFromLevel0)
  }

  test("gated shape with a known output substitutes from stored counts") {
    val (store, w0) = mkSparse("known", xff = 0.3f)
    RollupSubstitution.register(spark, store)
    try {
      val l0 = store.levelData(0).select("metric", "interval", "value")
      def gated = l0
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") > 0 &&
          col("known") / lit(5.0) >= lit(0.3f.toDouble))
        .select("metric", "interval", "value", "known")
      assert(!hasAggregate(gated),
        s"known-output gated shape should substitute:\n${gated.queryExecution.optimizedPlan}")
      // the 1-point window fails the 0.3 gate (1/5 = 0.2) on BOTH sides
      val rows = gated.collect().map(r =>
        (r.getAs[Long]("interval"), r.getAs[Double]("value"), r.getAs[Long]("known"))).toSet
      assert(rows == Set((w0, 12.0, 5L)))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("too-old points routed into coarse archives disable substitution") {
    val (store, _) = mkSparse("diverge")
    // age beyond level-0/level-1 retention but within level 2 → routes
    // directly into the coarse archive, invisible to level 0
    val oldTs = Now - levels3(1).retention - 3600L
    store.updateMany(Seq(("m", oldTs, 7.0, 99L)).toDF("metric", "ts", "value", "seq"), Now)
    assert(!store.rollupsDerivedFromLevel0)
    RollupSubstitution.register(spark, store)
    try {
      val l0 = store.levelData(0).select("metric", "interval", "value")
      val q = l0.groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(hasAggregate(q),
        s"diverged store must not substitute:\n${q.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("transformValues degrades counts and divergence; substitution stops") {
    val (store, _) = mkSparse("transform")
    store.transformValues("m", _ * 2)
    assert(!store.countsExact && !store.rollupsDerivedFromLevel0)
    RollupSubstitution.register(spark, store)
    try {
      val l0 = store.levelData(0).select("metric", "interval", "value")
      val q = l0.groupBy(col("metric"),
          (col("interval") - col("interval") % lit(1800L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(hasAggregate(q))
      // and the plain query over the transformed level-0 is still right
      val Array(row) = q.collect()
      assert(math.abs(row.getAs[Double]("value") - 2 * 160.0 / 6) < 1e-9)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("external rollup upserts without counts degrade exactness") {
    val (store, w0) = mkSparse("external")
    store.upsertRollups(1, Seq(("m", w0 + 600L, 3.5))
      .toDF("metric", "interval", "value"))
    assert(!store.countsExact)
    assert(!store.rollupsDerivedFromLevel0)
    // the upserted row landed with null counts, value intact
    val r = store.levelData(1).where(col("interval") === w0 + 600L).collect()
    assert(r.length == 1 && r.head.getAs[Double]("value") == 3.5)
    assert(r.head.isNullAt(r.head.fieldIndex("known")))
  }

  test("streaming stateful rollups carry exact counts") {
    // upsertRollups WITH counts keeps countsExact (divergence is still
    // marked — external rows bypass the cascade)
    val (store, w0) = mkSparse("stream")
    store.upsertRollups(1, Seq(("m", w0 + 600L, 3.5, 2L, 7.0))
      .toDF("metric", "interval", "value", "known", "vsum"))
    assert(store.countsExact)
    val r = store.levelData(1).where(col("interval") === w0 + 600L).collect()
    assert(r.length == 1 && r.head.getAs[Long]("known") == 2L &&
      r.head.getAs[Double]("vsum") == 7.0)
  }
}
