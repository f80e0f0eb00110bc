package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Heterogeneous-policy substitution: a store with per-metric retention
  * (whisper's storage-schemas.conf shape) refuses store-wide
  * substitution, but a query PINNED to metrics of one policy substitutes
  * against that policy's levels — the pinning predicate is carried onto
  * the shared level directory's scan.
  */
class HeteroPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  /** Store with metric a @ (60s → 300s) and metric b @ (60s → 600s),
    * both xff=0 average; 20 minutes of minutely points for each.
    */
  private def mkHetero(): (MetricStore, Long) = {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero").toString, numBuckets = 4)
    store.create("a",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)), xff = 0f))
    store.create("b",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(600, 1200)), xff = 0f))
    val base = Now - 1200
    val w0 = base - base % 600
    val pts = (0 until 20).flatMap(i => Seq(
      ("a", w0 + i * 60L, 10.0 + i, i.toLong),
      ("b", w0 + i * 60L, 100.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    (store, w0)
  }

  private def hasAggregate(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  private def alignAgg(store: MetricStore, step: Long,
                       pin: org.apache.spark.sql.Column) =
    store.levelData(0)
      .select("metric", "interval", "value")
      .where(pin)
      .groupBy(col("metric"),
        (col("interval") - col("interval") % lit(step)).as("interval"))
      .agg(avg(col("value")).as("value"))

  test("metric-pinned aggregate substitutes against the pinned policy's level") {
    val (store, w0) = mkHetero()
    RollupSubstitution.register(spark, store)
    try {
      val q = alignAgg(store, 300L, col("metric") === "a")
      assert(!hasAggregate(q),
        s"pinned substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      // values = recompute (windows of 5 minutely points, avg)
      val got = q.orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      val expect = (0 until 4).map(wi =>
        (w0 + wi * 300L) -> (10.0 + wi * 5 + 2)).toMap
      assert(got == expect, s"wrong values: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("the OTHER policy's step substitutes for its own metric only") {
    val (store, _) = mkHetero()
    RollupSubstitution.register(spark, store)
    try {
      // b's 600s level exists; a has no 600s level
      val qb = alignAgg(store, 600L, col("metric") === "b")
      assert(!hasAggregate(qb),
        s"b-pinned 600s substitution did not fire:\n${qb.queryExecution.optimizedPlan}")
      val gotB = qb.orderBy("interval").collect()
        .map(r => r.getAs[Double]("value")).toSeq
      assert(gotB == Seq(104.5, 114.5), s"wrong b values: $gotB")
      val qa = alignAgg(store, 600L, col("metric") === "a")
      assert(hasAggregate(qa),
        "a-pinned 600s aggregate wrongly substituted (a has no 600s level)")
      // a's 300s step must not substitute under b's pin either
      val qba = alignAgg(store, 300L, col("metric") === "b")
      assert(hasAggregate(qba),
        "b-pinned 300s aggregate wrongly substituted (b has no 300s level)")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("unpinned / multi-policy-pinned aggregates on a hetero store refuse") {
    val (store, _) = mkHetero()
    RollupSubstitution.register(spark, store)
    try {
      assert(hasAggregate(alignAgg(store, 300L, lit(true))),
        "unpinned aggregate on a heterogeneous store wrongly substituted")
      assert(hasAggregate(
        alignAgg(store, 300L, col("metric").isin("a", "b"))),
        "IN spanning two policies wrongly substituted")
      // LIKE restricts to metric but pins no names — must refuse
      assert(hasAggregate(alignAgg(store, 300L, col("metric").like("a%"))),
        "LIKE pin (no literal names) wrongly substituted")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("IN over same-policy metrics substitutes; unknown names don't block") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero2").toString, numBuckets = 4)
    val pol =
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)), xff = 0f)
    store.create("a", pol)
    store.create("c", pol)
    store.create("b",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(600, 1200)), xff = 0f))
    val base = Now - 1200
    val w0 = base - base % 600
    val pts = (0 until 20).flatMap(i => Seq(
      ("a", w0 + i * 60L, 10.0 + i, i.toLong),
      ("c", w0 + i * 60L, 50.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val q = alignAgg(store, 300L, col("metric").isin("a", "c"))
      assert(!hasAggregate(q),
        s"same-policy IN did not substitute:\n${q.queryExecution.optimizedPlan}")
      assert(q.count() == 8) // 4 windows × 2 metrics

      // a name the store never created resolves no policy but cannot
      // change the choice — both sides return nothing for it
      val q2 = alignAgg(store, 300L, col("metric").isin("a", "ghost"))
      assert(!hasAggregate(q2),
        s"IN with unknown name did not substitute:\n${q2.queryExecution.optimizedPlan}")
      assert(q2.count() == 4)
    } finally spark.experimental.extraOptimizations = Nil
  }

  private def hasUnion(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.nonEmpty

  test("two-family IN-pin substitutes as a union of per-family level scans") {
    // both families have a 300s level (at the same index here), but the
    // policies differ — the single-policy path refuses, the multi-policy
    // union path must fire and produce recompute-identical values
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero-mp").toString, numBuckets = 4)
    store.create("a",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)), xff = 0f))
    store.create("b",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200),
        ArchiveInfo(600, 1200)), xff = 0f))
    val base = Now - 1200
    val w0 = base - base % 600
    val pts = (0 until 20).flatMap(i => Seq(
      ("a", w0 + i * 60L, 10.0 + i, i.toLong),
      ("b", w0 + i * 60L, 100.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val q = alignAgg(store, 300L, col("metric").isin("a", "b"))
      assert(!hasAggregate(q),
        s"two-family pin did not substitute:\n${q.queryExecution.optimizedPlan}")
      assert(hasUnion(q),
        s"expected a union of per-family scans:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getString(0), r.getAs[Long]("interval")) ->
          r.getAs[Double]("value")).toMap
      val expect = (0 until 4).flatMap(wi => Seq(
        ("a", w0 + wi * 300L) -> (10.0 + wi * 5 + 2),
        ("b", w0 + wi * 300L) -> (100.0 + wi * 5 + 2))).toMap
      assert(got == expect, s"wrong union values: $got")

      // an unknown name in the pin resolves no family and cannot block
      val q2 = alignAgg(store, 300L, col("metric").isin("a", "b", "ghost"))
      assert(!hasAggregate(q2) && hasUnion(q2),
        "unknown name in a multi-family pin blocked the union rewrite")
      assert(q2.count() == 8)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("multi-family pin: each branch takes its own level choice") {
    // family a covers 600s at level 1; family b at level 2 (via 300s) —
    // the union's branches must read DIFFERENT levels. `last` kernel:
    // cascades exactly at any depth under xff=0.
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero-lvl").toString, numBuckets = 4)
    store.create("a",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(600, 1200)),
        xff = 0f, AggregationMethod.Last))
    store.create("b",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200),
        ArchiveInfo(600, 1200)), xff = 0f, AggregationMethod.Last))
    val base = Now - 1200
    val w0 = base - base % 600
    val pts = (0 until 20).flatMap(i => Seq(
      ("a", w0 + i * 60L, 10.0 + i, i.toLong),
      ("b", w0 + i * 60L, 100.0 + i, i.toLong)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("metric").isin("a", "b"))
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(600L)).as("interval"))
        .agg(max_by(col("value"), col("interval")).as("value"))
      assert(!hasAggregate(q) && hasUnion(q),
        s"different-level union did not fire:\n${q.queryExecution.optimizedPlan}")
      // last of each 600s window = the 10th minutely point's value
      val got = q.collect()
        .map(r => (r.getString(0), r.getAs[Long]("interval")) ->
          r.getAs[Double]("value")).toMap
      val expect = Map(
        ("a", w0) -> 19.0, ("a", w0 + 600L) -> 29.0,
        ("b", w0) -> 109.0, ("b", w0 + 600L) -> 119.0)
      assert(got == expect, s"wrong per-level union values: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("multi-family pin refuses when one family lacks the level") {
    val (store, _) = mkHetero() // a @ 300s only, b @ 600s only
    RollupSubstitution.register(spark, store)
    try {
      for (step <- Seq(300L, 600L)) {
        val q = alignAgg(store, step, col("metric").isin("a", "b"))
        assert(hasAggregate(q) && !hasUnion(q),
          s"step=$step: union fired although one family cannot substitute")
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GATED multi-family pin: unions when both families share the gate, refuses otherwise") {
    // g1 @ (60→300) and g2 @ (60→300→600), both xff=0.5 average: a
    // gated query restating the 0.5/5-slot gate substitutes BOTH
    // branches (the gate is validated against each family's own policy
    // inside its branch); g4 @ xff=0.25 breaks the all-or-nothing rule.
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero-gmp").toString, numBuckets = 4)
    store.create("g1",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)),
        xff = 0.5f, AggregationMethod.Average))
    store.create("g2",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200),
        ArchiveInfo(600, 1200)), xff = 0.5f, AggregationMethod.Average))
    store.create("g4",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)),
        xff = 0.25f, AggregationMethod.Average))
    val base = Now - 1200
    val w0 = base - base % 600
    // per metric: window w0 fully populated (passes any gate), w0+300
    // holds 2/5 points (fails 0.5, passes 0.25 — the gates differ)
    val pts = Seq("g1" -> 10.0, "g2" -> 100.0, "g4" -> 1000.0).flatMap {
      case (m, v0) =>
        (0 until 5).map(i => (m, w0 + i * 60L, v0 + i, i.toLong)) ++
          Seq((m, w0 + 300L, v0, 9L), (m, w0 + 360L, v0, 10L))
    }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val xffF32 = 0.5f.toDouble
      def gated(pin: Seq[String]) = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("metric").isin(pin: _*))
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") > 0 && col("known") / lit(5.0) >= lit(xffF32))
        .select("metric", "interval", "value")

      val q = gated(Seq("g1", "g2"))
      assert(!hasAggregate(q) && hasUnion(q),
        s"gated two-family pin did not union:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getString(0), r.getAs[Long]("interval")) ->
          r.getAs[Double]("value")).toMap
      assert(got == Map(("g1", w0) -> 12.0, ("g2", w0) -> 102.0),
        s"wrong gated union values: $got")

      // mixed xff: g4's store gate is 0.25 — the query's 0.5 gate does
      // not equal it, so that branch refuses and all-or-nothing holds
      val qBad = gated(Seq("g1", "g4"))
      assert(hasAggregate(qBad) && !hasUnion(qBad),
        "union fired although one family's gate differs from the query's")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("divergence marker still vetoes pinned substitution") {
    val (store, _) = mkHetero()
    store.markRollupsDiverged()
    RollupSubstitution.register(spark, store)
    try {
      assert(hasAggregate(alignAgg(store, 300L, col("metric") === "a")),
        "diverged store wrongly substituted a pinned read")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("pinned GATED shape uses the pinned policy's xff") {
    // metric g @ xff=0.5: the store gate drops 2-known windows; a query
    // restating that gate over level-0, pinned to g, substitutes
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-hetero3").toString, numBuckets = 4)
    store.create("g",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(300, 1200)),
        xff = 0.5f, AggregationMethod.Average))
    store.create("h",
      RetentionPolicy(Seq(ArchiveInfo(60, 1200), ArchiveInfo(600, 1200)), xff = 0f))
    val base = Now - 1200
    val w0 = base - base % 600
    // window w0: 5 points (passes 0.5 gate); w0+300: 2 points (gated out)
    val pts = ((0 until 5).map(i => ("g", w0 + i * 60L, 10.0 + i, i.toLong)) ++
      Seq(("g", w0 + 300L, 1.0, 9L), ("g", w0 + 360L, 2.0, 10L)))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val xffF32 = 0.5f.toDouble
      val q = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("metric") === "g")
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") > 0 && col("known") / lit(5.0) >= lit(xffF32))
        .select("metric", "interval", "value")
      assert(!hasAggregate(q),
        s"pinned gated substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect().map(r =>
        r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 12.0), s"wrong gated values: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
