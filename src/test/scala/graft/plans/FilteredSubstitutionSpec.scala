package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** Whisper's fetch shape — one metric, a step-aligned time range, rollup
  * granularity — substitutes to a FILTERED level scan: group-key metric
  * predicates and window-edge-aligned interval bounds commute with the
  * (metric, align) grouping, so they are carried onto the substituted
  * scan instead of vetoing it. Everything that does not provably commute
  * (value predicates, unaligned bounds) still blocks the rewrite.
  */
class FilteredSubstitutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Now = 1706659200L

  private def mkStore(): (MetricStore, Long) = {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-filtsub").toString, numBuckets = 4)
    store.createAll(Seq("a", "b"),
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (for {
      m <- Seq("a", "b")
      i <- 0 until 10
    } yield (m, w0 + i * 60L, (if (m == "a") 10.0 else 100.0) + i))
      .zipWithIndex.map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    (store, w0)
  }

  private def hasAggregate(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  private def aligned(store: MetricStore) = store.levelData(0)
    .select("metric", "interval", "value")

  private def grouped(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("metric"),
      (col("interval") - col("interval") % lit(300L)).as("interval"))
    .agg(avg(col("value")).as("value"))

  test("metric equality filter substitutes to a filtered level scan") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store).where(col("metric") === "a"))
      assert(!hasAggregate(q),
        s"metric-filtered substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("interval"),
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("a", w0, 12.0), ("a", w0 + 300L, 17.0)),
        s"wrong filtered rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("step-aligned interval range (whisper fetch bounds) substitutes") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "b" &&
          col("interval") >= lit(w0 + 300L) && col("interval") < lit(w0 + 600L)))
      assert(!hasAggregate(q),
        s"range-filtered substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("interval"),
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("b", w0 + 300L, 107.0)), s"wrong ranged rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("carried predicates reach the level scan as pushed parquet filters") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "a" && col("interval") >= lit(w0 + 300L)))
      assert(!hasAggregate(q))
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters") &&
        physical.contains("EqualTo(metric,a)") &&
        physical.contains("GreaterThanOrEqual(interval"),
        s"carried filter not pushed to the level scan:\n$physical")
      // the metric pin and the interval bound also prune PARTITION
      // DIRECTORIES: pb is a function of the metric name (computed
      // driver-side with the writer's hash) and tb = interval div
      // bucketSecs — at scale the difference between reading every
      // (pb, tb) dir and the dashboard's few
      assert(physical.contains("PartitionFilters: [pb") &&
        physical.contains(" IN (") &&
        physical.contains("(tb"),
        s"metric pin / interval bound did not become partition filters:\n$physical")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("metric IN filter substitutes; values cover both kept groups") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store).where(col("metric").isin("a", "b")))
      assert(!hasAggregate(q),
        s"IN-filtered substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().length == 4)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("unaligned interval bound does NOT substitute (partial window)") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store).where(col("interval") >= lit(w0 + 60L)))
      assert(hasAggregate(q),
        s"unaligned bound wrongly substituted:\n${q.queryExecution.optimizedPlan}")
      // and the recompute answers the partial window correctly
      val got = q.where(col("metric") === "a").collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0, 12.5), (w0 + 300L, 17.0)), s"wrong partial rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("value predicate still vetoes substitution") {
    val (store, _) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store).where(col("value") > 12.5))
      assert(hasAggregate(q),
        s"value filter wrongly substituted:\n${q.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("window() spelling carries metric + aligned-range filters too") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = aligned(store)
        .where(col("metric") === "a" && col("interval") >= lit(w0 + 300L))
        .select(col("metric"), timestamp_seconds(col("interval")).as("ts"), col("value"))
        .groupBy(col("metric"), window(col("ts"), "300 seconds"))
        .agg(avg(col("value")).as("value"))
      assert(!hasAggregate(q),
        s"filtered window() substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"),
          r.getStruct(1).getTimestamp(0).toInstant.getEpochSecond,
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("a", w0 + 300L, 17.0)), s"wrong filtered windows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("SQL WHERE clause (fetch shape) substitutes through Engine.install views") {
    val (store, w0) = mkStore()
    graft.Engine.install(spark, store, "fsub")
    try {
      val q = spark.sql(
        s"""SELECT metric, interval - interval % 300 AS interval, avg(value) AS value
           |FROM fsub_level_0
           |WHERE metric = 'b' AND interval >= ${w0 + 300L} AND interval < ${w0 + 600L}
           |GROUP BY 1, 2""".stripMargin)
      assert(!hasAggregate(q),
        s"SQL filtered substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("interval"),
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("b", w0 + 300L, 107.0)), s"wrong SQL rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("timestamp bound on window edges carries (window() spelling)") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = aligned(store)
        .select(col("metric"), timestamp_seconds(col("interval")).as("ts"), col("value"))
        .where(col("metric") === "a" && col("ts") >= lit(ts(w0 + 300L)))
        .groupBy(col("metric"), window(col("ts"), "300 seconds"))
        .agg(avg(col("value")).as("value"))
      assert(!hasAggregate(q),
        s"ts-bound window() substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"),
          r.getStruct(1).getTimestamp(0).toInstant.getEpochSecond,
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("a", w0 + 300L, 17.0)), s"wrong ts-bound windows: $got")
      // and the canonicalized bound pushes down as a plain long filter
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("GreaterThanOrEqual(interval"),
        s"ts bound not canonicalized to a pushed interval filter:\n$physical")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("timestamp upper bound against timestamp_seconds(interval) carries (align spelling)") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "b" &&
          timestamp_seconds(col("interval")) < lit(ts(w0 + 300L))))
      assert(!hasAggregate(q),
        s"ts-bound align substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("interval"),
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("b", w0, 102.0)), s"wrong ts-bounded rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("literal-on-the-left timestamp bound carries") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "a" &&
          lit(ts(w0 + 300L)) <= timestamp_seconds(col("interval"))))
      assert(!hasAggregate(q),
        s"reversed ts bound did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0 + 300L, 17.0)), s"wrong reversed-bound rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("unaligned timestamp bound does NOT substitute") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(timestamp_seconds(col("interval")) >= lit(ts(w0 + 60L))))
      assert(hasAggregate(q),
        s"unaligned ts bound wrongly substituted:\n${q.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("sub-second timestamp bound does NOT substitute") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val half = java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(w0 + 300L).plusMillis(500))
      val q = grouped(aligned(store)
        .where(timestamp_seconds(col("interval")) >= lit(half)))
      assert(hasAggregate(q),
        s"sub-second ts bound wrongly substituted:\n${q.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  /** The alignment check must convert the timestamp literal to SECONDS
    * before the `% step` test: a bound that is unaligned in seconds still
    * has micros divisible by any step that divides 1e6 (here 100), so a
    * raw-literal check would carry a mid-window cut onto the level scan.
    */
  test("micros-divisible but seconds-unaligned cast bound does NOT substitute") {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-microtrap").toString, numBuckets = 4)
    store.createAll(Seq("a"),
      RetentionPolicy(Seq(ArchiveInfo(20, 300), ArchiveInfo(100, 300)), xff = 0f))
    val base = Now - 2000
    val w0 = base - base % 100
    val pts = (0 until 10).map(i => ("a", w0 + i * 20L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val bound = w0 + 60L // 60 % 100 != 0, but 60e6 % 100 == 0
      val q = store.levelData(0).select("metric", "interval", "value")
        .where(col("interval").cast("timestamp") >= lit(ts(bound)))
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(100L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(hasAggregate(q),
        s"seconds-unaligned cast bound wrongly substituted:\n${q.queryExecution.optimizedPlan}")
      // the recompute answers the partial window correctly
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0, 13.5), (w0 + 100L, 17.0)), s"wrong partial rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("aligned cast-spelled timestamp bound substitutes") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "a" &&
          col("interval").cast("timestamp") >= lit(ts(w0 + 300L))))
      assert(!hasAggregate(q),
        s"aligned cast ts bound did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0 + 300L, 17.0)), s"wrong cast-bound rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("inclusive BETWEEN bounds carry when the next second is window-aligned") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      // BETWEEN desugars to >= && <=; the inclusive end w0+599 commutes
      // because intervals are integral: <= w0+599 ⇔ < w0+600 (aligned)
      val q = grouped(aligned(store)
        .where(col("metric") === "a" &&
          col("interval").between(lit(w0 + 300L), lit(w0 + 599L))))
      assert(!hasAggregate(q),
        s"BETWEEN bounds did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0 + 300L) -> 17.0), s"wrong BETWEEN rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("inclusive end NOT on a window edge does NOT substitute") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("interval") <= lit(w0 + 300L))) // keeps ONE row of window w0+300
      assert(hasAggregate(q),
        s"mid-window inclusive end wrongly substituted:\n${q.queryExecution.optimizedPlan}")
      val got = q.where(col("metric") === "a").collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set(w0 -> 12.0, (w0 + 300L) -> 15.0), s"wrong partial rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("equality on the aligned expression selects one whole window and carries") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "b" &&
          (col("interval") - col("interval") % lit(300L)) === lit(w0 + 300L)))
      assert(!hasAggregate(q),
        s"aligned-expression equality did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set((w0 + 300L) -> 107.0), s"wrong equality rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("null-safe equality (<=>) on the aligned expression carries too") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = grouped(aligned(store)
        .where(col("metric") === "a" &&
          (col("interval") - col("interval") % lit(300L)) <=> lit(w0)))
      assert(!hasAggregate(q),
        s"null-safe equality did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      assert(got == Set(w0 -> 12.0), s"wrong null-safe equality rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("date_trunc('day') equality over an hourly grouping carries as a day range") {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-dayeq").toString, numBuckets = 4)
    store.createAll(Seq("a", "b"),
      RetentionPolicy(Seq(ArchiveInfo(600, 2000), ArchiveInfo(3600, 600)), xff = 0f))
    val d0 = (Now - 400000) / 86400 * 86400 // a day boundary
    val pts = (for {
      m <- Seq("a", "b")
      i <- 0 until 8 // spans d0 hours 0..1, plus two points the day before
    } yield (m, d0 + (i - 2) * 1800L, (if (m == "a") 10.0 else 100.0) + i))
      .zipWithIndex.map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      // "hourly rollups for one day": block width 86400 is a multiple of
      // the 3600 level step and the literal is day-aligned
      val q = store.levelData(0).select("metric", "interval", "value")
        .where(col("metric") === "a" &&
          date_trunc("day", timestamp_seconds(col("interval"))) === lit(ts(d0)))
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(3600L)).as("interval"))
        .agg(avg(col("value")).as("value"))
      assert(!hasAggregate(q),
        s"day-equality did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"))).toSet
      // hour 0 of d0: slots at d0, d0+1800 (values 12, 13); hour 1:
      // d0+3600, +5400 (14, 15); hour 2: d0+7200, +9000 (16, 17);
      // the two pre-d0 points are excluded by the day selector
      assert(got == Set(d0 -> 12.5, (d0 + 3600L) -> 14.5, (d0 + 7200L) -> 16.5),
        s"wrong day-equality rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("day-unaligned date_trunc equality literal does NOT substitute") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      // selects nothing in the original (trunc output is day-aligned);
      // canonicalizing to a range would WRONGLY select rows — must veto
      val q = grouped(aligned(store)
        .where(date_trunc("day", timestamp_seconds(col("interval"))) === lit(ts(w0))))
      assert(hasAggregate(q),
        s"unaligned day-equality wrongly substituted:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().isEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("dense fetch grid (left join on a slot range) rides the substituted scan") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      // whisper __archive_fetch: one metric, aligned [from, until), one
      // row per slot with null for missing windows — spelled as a grid
      // left-joined onto the rollup aggregate. The inner Aggregate
      // substitutes bottom-up; the grid join rides on top.
      val from = w0
      val until = w0 + 900L // 3 slots; only 2 have data
      val agg = grouped(aligned(store)
        .where(col("metric") === "a" &&
          col("interval") >= lit(from) && col("interval") < lit(until)))
      val grid = spark.range(from, until, 300).select(col("id").as("interval"))
      val q = grid.join(agg, Seq("interval"), "left")
        .select(col("interval"), col("value"))
        .orderBy("interval")
      assert(!hasAggregate(q),
        s"fetch-grid read did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(got.toSeq == Seq(
        (w0, Some(12.0)), (w0 + 300L, Some(17.0)), (w0 + 600L, None)),
        s"wrong dense grid: ${got.toSeq}")
      // the grid joins by broadcast — the level scan must never shuffle
      // for a slot skeleton
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"grid join did not broadcast:\n$physical")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("SQL dense grid (range table function) substitutes through Engine.install views") {
    val (store, w0) = mkStore()
    graft.Engine.install(spark, store, "fgrid")
    try {
      val q = spark.sql(
        s"""SELECT g.id AS interval, r.value
           |FROM range(${w0}, ${w0 + 900L}, 300) AS g
           |LEFT JOIN (
           |  SELECT interval - interval % 300 AS w, avg(value) AS value
           |  FROM fgrid_level_0
           |  WHERE metric = 'a'
           |    AND interval >= $w0 AND interval < ${w0 + 900L}
           |  GROUP BY metric, 1
           |) r ON r.w = g.id
           |ORDER BY 1""".stripMargin)
      assert(!hasAggregate(q),
        s"SQL grid substitution did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(got.toSeq == Seq(
        (w0, Some(12.0)), (w0 + 300L, Some(17.0)), (w0 + 600L, None)),
        s"wrong SQL dense grid: ${got.toSeq}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("arbitrary HAVING over counts substitutes on an xff=0 store (align spelling)") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      // user-chosen quality gate, NOT the store's xff gate: the bare
      // 4-output aggregate substitutes and the HAVING rides above it
      val q = aligned(store)
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") >= 5 && col("value") > 50.0)
      assert(!hasAggregate(q),
        s"HAVING-over-counts did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("interval"),
          r.getAs[Double]("value"), r.getAs[Long]("known"))).toSet
      assert(got == Set(("b", w0, 102.0, 5L), ("b", w0 + 300L, 107.0, 5L)),
        s"wrong HAVING rows: $got")

    } finally spark.experimental.extraOptimizations = Nil
  }

  test("HAVING over counts substitutes on the date_trunc spelling, outputs reordered") {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-havingtrunc").toString, numBuckets = 4)
    store.createAll(Seq("a", "b"),
      RetentionPolicy(Seq(ArchiveInfo(600, 2000), ArchiveInfo(3600, 600)), xff = 0f))
    val h0 = (Now - 400000) / 3600 * 3600
    // metric a fills 4 slots of hour h0; metric b only 2
    val pts = (for {
      (m, n) <- Seq(("a", 4), ("b", 2)); i <- 0 until n
    } yield (m, h0 + i * 600L, (if (m == "a") 10.0 else 100.0) + i))
      .zipWithIndex.map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0).select("metric", "interval", "value")
        .groupBy(col("metric"),
          date_trunc("hour", timestamp_seconds(col("interval"))).as("hour"))
        .agg(count(col("value")).as("known"), avg(col("value")).as("value"))
        .where(col("known") >= 3) // user gate, not the store's (xff=0)
      assert(!hasAggregate(q),
        s"trunc HAVING-over-counts did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("known"),
          r.getAs[Double]("value"))).toSet
      assert(got == Set(("a", 4L, 11.5)), s"wrong trunc HAVING rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("bare 4-output rollup read (value + known) substitutes on an xff=0 store") {
    val (store, w0) = mkStore()
    RollupSubstitution.register(spark, store)
    try {
      val q = aligned(store)
        .where(col("metric") === "a")
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
      assert(!hasAggregate(q),
        s"bare 4-output read did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[Long]("interval"), r.getAs[Double]("value"),
          r.getAs[Long]("known"))).toSet
      assert(got == Set((w0, 12.0, 5L), (w0 + 300L, 17.0, 5L)),
        s"wrong 4-output rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("arbitrary HAVING does NOT substitute on an xff>0 store (sub-gate rows differ)") {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-havinggated").toString, numBuckets = 4)
    store.createAll(Seq("a"),
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0.5f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("a", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      // known >= 1 would KEEP sub-gate windows the xff=0.5 level dropped
      // — the level is not a sound source for this query
      val q = store.levelData(0).select("metric", "interval", "value")
        .groupBy(col("metric"),
          (col("interval") - col("interval") % lit(300L)).as("interval"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") >= 1)
      assert(hasAggregate(q),
        s"user HAVING wrongly substituted on a gated store:\n${q.queryExecution.optimizedPlan}")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("gated date_trunc shape carries a metric filter onto the hourly scan") {
    import spark.implicits._
    val store = new MetricStore(
      spark, Files.createTempDirectory("ms-filtgate").toString, numBuckets = 4)
    store.createAll(Seq("a", "b"),
      RetentionPolicy(Seq(ArchiveInfo(600, 600), ArchiveInfo(3600, 200)), xff = 0.5f))
    val h0 = (Now - 30000) / 3600 * 3600
    val pts = (for {
      m <- Seq("a", "b")
      i <- 0 until 4
    } yield (m, h0 + i * 600L, (if (m == "a") 10.0 else 100.0) + i))
      .zipWithIndex.map { case ((m, t, v), i) => (m, t, v, i.toLong) }
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)
    RollupSubstitution.register(spark, store)
    try {
      val q = store.levelData(0)
        .select("metric", "interval", "value")
        .where(col("metric") === "a")
        .groupBy(col("metric"),
          date_trunc("hour", timestamp_seconds(col("interval"))).as("hour"))
        .agg(avg(col("value")).as("value"), count(col("value")).as("known"))
        .where(col("known") > 0 &&
          col("known").cast("double") / lit(6.0) >= lit(0.5f.toDouble))
        .select("metric", "hour", "value")
      assert(!hasAggregate(q),
        s"filtered gated trunc did not substitute:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => (r.getAs[String]("metric"),
          r.getTimestamp(1).toInstant.getEpochSecond, r.getAs[Double]("value"))).toSet
      assert(got == Set(("a", h0, 11.5)), s"wrong filtered gated rows: $got")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
