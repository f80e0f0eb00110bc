package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.ops._

/** Driver-verifiable queries for every core whisper operator (SURVEY.md
  * §2.1), run over the `events` table reshaped to metric points
  * (metric = event_type, tsec = epoch-second, value).
  *
  * Fixed clock: events span 2024-01-01..2024-01-30, so "now" is pinned to
  * 2024-01-31T00:00:00Z for deterministic age routing.
  *
  * Aggregated doubles are rounded to 4 decimals on output in BOTH engines:
  * source values carry 2 decimals and windows span ≤10 slots, so true
  * values stay ≥1e-5 away from rounding boundaries — FP summation-order
  * differences between Spark and DuckDB cannot flip the hash.
  */
object WhisperQueries {

  val Now = 1706659200L // 2024-01-31T00:00:00Z

  val Step0 = 60
  val RollStep = 300 // level-1 step for the kernel queries; slots = 5
  val Xff = 0.5f

  /** Single-level policy covering the whole event history (50000·60s ≈ 34.7d). */
  val wideOpen = RetentionPolicy(Seq(ArchiveInfo(60, 50000)))

  /** Three-level policy for age routing: 1m:2d, 5m:7d, 30m:14d — events
    * older than 14d are silently dropped (whisper.py:781-782).
    */
  val routing = RetentionPolicy(
    Seq(ArchiveInfo(60, 2880), ArchiveInfo(300, 2016), ArchiveInfo(1800, 672)))

  val retentionSpecs: Seq[String] = Seq(
    "60:1440", "1h:7d", "10s:10h", "1m:30d", "15m:8", "1h:1y", "1s:1d",
    "7d:1y", "10:2y")

  val infoPolicies: Seq[RetentionPolicy] = Seq(
    RetentionPolicy(Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60))),
    RetentionPolicy(
      Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60), ArchiveInfo(3600, 24),
        ArchiveInfo(86400, 365))),
    RetentionPolicy(Seq(ArchiveInfo(60, 1440))))

  // ---- shared Spark-side building blocks ------------------------------

  /** events → (metric, tsec, value, seq); seq (= event_id) is the arrival
    * order whisper's last-write-wins dedup keys on (whisper.py:806-808).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = Io.readTable(s, dir, "events")
    raw.select(
      col("event_type").as("metric"),
      Io.tsec(raw, "ts").as("tsec"),
      col("value"),
      col("event_id").as("seq"))
  }

  /** Level-0: align to the 60s grid, LWW-dedup — the update_many write path
    * through the real ingest operator. Memoized + cached per (session,
    * dir): level-0 is the materialized base table every rollup/fetch
    * query reads (the store architecture), so queries share one
    * computation instead of re-ingesting per query.
    */
  private val l0memo =
    new Memo[DataFrame]("l0")

  def level0(s: SparkSession, dir: String): DataFrame =
    l0memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ =>
        Ingest
          .routeAndDedup(events(s, dir).withColumn("ts", col("tsec")), wideOpen, Now)
          .select(col("metric"), col("interval"), col("value"))
          .cache())

  /** Store for the substituted-read query (w23): full event history
    * ingested ONCE per (session, dir) under a `last` policy — the read
    * query is what w23 times/validates, not the (w20-covered) ingest.
    */
  private val w23memo =
    new Memo[graft.store.MetricStore]("w23")

  private def w23Store(s: SparkSession, dir: String): graft.store.MetricStore =
    w23memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ => {
        val root = java.nio.file.Files.createTempDirectory("graft-w23").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = Xff,
            AggregationMethod.Last))
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store
      })

  /** Store for the date_trunc substituted-read query (w24): an HOURLY
    * rollup level (date_trunc only speaks fixed calendar units), xff=0,
    * `last` kernel (stored picks are raw event doubles, so the oracle
    * compare is exact without rounding — and rounding can't live in an
    * outer Project anyway: CollapseProject would fold it into the
    * Aggregate and change the matched shape). Ingested once per
    * (session, dir) like w23.
    */
  private val w24memo =
    new Memo[graft.store.MetricStore]("w24")

  private def w24Store(s: SparkSession, dir: String): graft.store.MetricStore =
    w24memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ => {
        val root = java.nio.file.Files.createTempDirectory("graft-w24").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(3600, 2000)), xff = 0f,
            AggregationMethod.Last))
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store
      })

  /** Store for the HETEROGENEOUS-policy substituted read (w30): two
    * retention families on ONE store (whisper's storage-schemas.conf
    * shape) — click/view roll up at 300s, signup/error/purchase at 600s,
    * both xff=0 `last`. Ingested once per (session, dir) like w23/w24.
    */
  private val w30memo =
    new Memo[graft.store.MetricStore]("w30")

  private def w30Store(s: SparkSession, dir: String): graft.store.MetricStore =
    w30memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ => {
        val root = java.nio.file.Files.createTempDirectory("graft-w30").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0f,
            AggregationMethod.Last))
        store.createAll(
          Seq("signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(600, 20000)), xff = 0f,
            AggregationMethod.Last))
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store
      })

  /** Store for the MULTI-policy pinned substituted read (w31): two
    * retention families that BOTH cover a 600s step at different level
    * indexes — click/view @ (60 → 600) read it from level 1,
    * signup/error/purchase @ (60 → 300 → 600) from level 2 — so a pin
    * spanning the families must union two different level choices.
    * xff=0 `last` (cascades exactly at any depth). Ingested once per
    * (session, dir) like w23/w24.
    */
  private val w31memo =
    new Memo[graft.store.MetricStore]("w31")

  private def w31Store(s: SparkSession, dir: String): graft.store.MetricStore =
    w31memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ => {
        val root = java.nio.file.Files.createTempDirectory("graft-w31").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(600, 20000)), xff = 0f,
            AggregationMethod.Last))
        store.createAll(
          Seq("signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000),
              ArchiveInfo(600, 20000)), xff = 0f,
            AggregationMethod.Last))
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store
      })

  /** Store for the GATED date_trunc substituted read (w25): hourly level
    * under xff = 0.05 (slots = 60; events fill ~3 minute-slots/hour, so
    * the ≥3-known gate discriminates — some hours pass, some don't),
    * `last` kernel for exact oracle values. Ingested once per
    * (session, dir) like w23/w24.
    */
  private val W25Xff = 0.05f
  private val w25memo =
    new Memo[graft.store.MetricStore]("w25")

  private def w25Store(s: SparkSession, dir: String): graft.store.MetricStore =
    w25memo.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir",
      _ => {
        val root = java.nio.file.Files.createTempDirectory("graft-w25").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(3600, 2000)), xff = W25Xff,
            AggregationMethod.Last))
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store
      })

  /** Even/odd event split → two independent level-0 series (src, dst) for
    * merge/fill/diff.
    */
  def splitSeries(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = events(s, dir)
    def lww(df: DataFrame): DataFrame =
      df.groupBy(col("metric"), Grid.align(col("tsec"), Step0).as("interval"))
        .agg(max_by(col("value"), col("seq")).as("value"))
    (lww(base.where(col("seq") % 2 === 0)), lww(base.where(col("seq") % 2 === 1)))
  }

  private def rollup(s: SparkSession, dir: String, m: AggregationMethod,
                     step: Int = RollStep, xff: Float = Xff,
                     round4: Boolean = true): DataFrame = {
    val df = Rollup.propagate(level0(s, dir), Step0, step, m, xff)
    val v = if (round4) round(col("value"), 4).as("value") else col("value")
    df.select(col("metric"), col("interval"), v).orderBy("metric", "interval")
  }

  // ---- shared SQL building blocks -------------------------------------

  val baseSql: String =
    """WITH base AS (
      |  SELECT event_type AS metric,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
      |         value,
      |         event_id AS seq
      |  FROM events
      |), l0 AS (
      |  -- whisper duplicate resolution (whisper.py:748,770,806-808): max
      |  -- timestamp wins, first-arrival on exact ts ties — the HUGEINT
      |  -- key tsec*1e10 - seq is monotone in (tsec asc, seq desc)
      |  SELECT metric, tsec - tsec % 60 AS interval,
      |         max_by(value, tsec::HUGEINT * 10000000000 - seq) AS value
      |  FROM base GROUP BY 1, 2
      |)""".stripMargin

  val splitSql: String =
    """WITH base AS (
      |  SELECT event_type AS metric,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
      |         value,
      |         event_id AS seq
      |  FROM events
      |), le AS (
      |  SELECT metric, tsec - tsec % 60 AS interval, max_by(value, seq) AS value
      |  FROM base WHERE seq % 2 = 0 GROUP BY 1, 2
      |), lo AS (
      |  SELECT metric, tsec - tsec % 60 AS interval, max_by(value, seq) AS value
      |  FROM base WHERE seq % 2 = 1 GROUP BY 1, 2
      |)""".stripMargin

  /** Rollup oracle for plain-aggregate kernels. The xff literal is the
    * f32-widened value — whisper stores xFilesFactor as an IEEE float32
    * (whisper.py:115 `!2LfL`), so e.g. 0.3 gates at 0.30000001192092896.
    */
  private def rollupSql(aggExpr: String, step: Int, slots: Int, xff: Float): String =
    s"""$baseSql
       |SELECT metric, interval - interval % $step AS interval,
       |       $aggExpr AS value
       |FROM l0 GROUP BY 1, 2
       |HAVING count(value) * 1.0 / $slots >= ${xff.toDouble}
       |ORDER BY 1, 2""".stripMargin

  /** Rollup oracle for the order-sensitive kernels (last/absmax/absmin):
    * row_number over the reference's tie-break order.
    */
  private def rollupPickSql(orderExpr: String, step: Int, slots: Int, xff: Float): String =
    s"""$baseSql, r AS (
       |  SELECT metric, interval - interval % $step AS w, interval, value FROM l0
       |)
       |SELECT metric, w AS interval, value FROM (
       |  SELECT metric, w, value,
       |         row_number() OVER (PARTITION BY metric, w ORDER BY $orderExpr) AS rn,
       |         count(value) OVER (PARTITION BY metric, w) AS known
       |  FROM r
       |) WHERE rn = 1 AND known * 1.0 / $slots >= ${xff.toDouble}
       |ORDER BY 1, 2""".stripMargin

  // ---- the queries ----------------------------------------------------

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "w01_update_many_lww",
      (s, dir) => level0(s, dir).orderBy("metric", "interval"),
      s"""$baseSql
         |SELECT metric, interval, value FROM l0 ORDER BY 1, 2""".stripMargin
    ),
    QueryDef(
      "w02_rollup_average",
      (s, dir) => rollup(s, dir, AggregationMethod.Average),
      rollupSql("round(avg(value), 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w03_rollup_sum",
      (s, dir) => rollup(s, dir, AggregationMethod.Sum),
      rollupSql("round(sum(value), 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w04_rollup_last",
      (s, dir) => rollup(s, dir, AggregationMethod.Last, round4 = false),
      rollupPickSql("interval DESC", RollStep, 5, 0.5f)),
    QueryDef(
      "w05_rollup_max",
      (s, dir) => rollup(s, dir, AggregationMethod.Max, round4 = false),
      rollupSql("max(value)", RollStep, 5, 0.5f)),
    QueryDef(
      "w06_rollup_min",
      (s, dir) => rollup(s, dir, AggregationMethod.Min, round4 = false),
      rollupSql("min(value)", RollStep, 5, 0.5f)),
    QueryDef(
      "w07_rollup_avg_zero",
      (s, dir) => rollup(s, dir, AggregationMethod.AvgZero),
      rollupSql("round(sum(value) / 5, 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w08_rollup_absmax",
      (s, dir) => rollup(s, dir, AggregationMethod.AbsMax, round4 = false),
      rollupPickSql("abs(value) DESC, interval ASC", RollStep, 5, 0.5f)),
    QueryDef(
      "w09_rollup_absmin",
      (s, dir) => rollup(s, dir, AggregationMethod.AbsMin, round4 = false),
      rollupPickSql("abs(value) ASC, interval ASC", RollStep, 5, 0.5f)),
    QueryDef(
      "w10_fetch_grid",
      (s, dir) => {
        // fetch('click', 2024-01-05 00:00 .. 2024-01-06 00:00) at 60s:
        // dense 1440-slot vector, null where no point (whisper.py:962-1034)
        val Some((_, from, until)) =
          Fetch.planFetch(wideOpen, 1704412800L, 1704499200L, Now)
        Fetch
          .fetchGrid(s, level0(s, dir), Seq("click"), from, until, Step0)
          .orderBy("interval")
      },
      s"""$baseSql
         |SELECT 'click' AS metric, g.interval, c.value
         |FROM (SELECT range AS interval FROM range(1704412860, 1704499260, 60)) g
         |LEFT JOIN (SELECT * FROM l0 WHERE metric = 'click') c USING (interval)
         |ORDER BY 2""".stripMargin
    ),
    QueryDef(
      "w11_archive_route",
      (s, dir) => {
        events(s, dir)
          .withColumn("level", Ingest.levelFor(lit(Now) - col("tsec"), routing))
          .where(col("level").isNotNull)
          .groupBy("metric", "level")
          .agg(count(lit(1)).as("n"))
          .orderBy("metric", "level")
      },
      s"""$baseSql
         |SELECT metric, level, count(*) AS n FROM (
         |  SELECT metric,
         |         CASE WHEN 1706659200 - tsec <= 172800 THEN 0
         |              WHEN 1706659200 - tsec <= 604800 THEN 1
         |              WHEN 1706659200 - tsec <= 1209600 THEN 2
         |         END AS level
         |  FROM base
         |) WHERE level IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),
    QueryDef(
      "w12_merge",
      (s, dir) => {
        val (src, dst) = splitSeries(s, dir)
        Combine.merge(src, dst).orderBy("metric", "interval")
      },
      s"""$splitSql
         |SELECT metric, interval, coalesce(le.value, lo.value) AS value
         |FROM le FULL JOIN lo USING (metric, interval)
         |ORDER BY 1, 2""".stripMargin
    ),
    QueryDef(
      "w13_fill",
      (s, dir) => {
        val (src, dst) = splitSeries(s, dir)
        Combine.fill(dst, src).orderBy("metric", "interval")
      },
      s"""$splitSql
         |SELECT metric, interval, coalesce(lo.value, le.value) AS value
         |FROM lo FULL JOIN le USING (metric, interval)
         |ORDER BY 1, 2""".stripMargin
    ),
    QueryDef(
      "w14_diff",
      (s, dir) => {
        val (src, dst) = splitSeries(s, dir)
        Combine
          .diff(src, dst)
          .select(col("metric"), col("interval"), col("value_a"), col("value_b"))
          .orderBy("metric", "interval")
      },
      s"""$splitSql
         |SELECT metric, interval, le.value AS value_a, lo.value AS value_b
         |FROM le FULL JOIN lo USING (metric, interval)
         |WHERE le.value IS DISTINCT FROM lo.value
         |ORDER BY 1, 2""".stripMargin
    ),
    QueryDef(
      "w15_resize_rebin",
      (s, dir) => rollup(s, dir, AggregationMethod.Average, step = 600, xff = 0.3f),
      rollupSql("round(avg(value), 4)", 600, 10, 0.3f)),
    QueryDef(
      "w20_store_ingest",
      // end-to-end write path: create a store, ingest every event through
      // updateMany (age routing, LWW dedup, touched-window cascade with
      // xff gate), then read back the MATERIALIZED level-1 table — the
      // same oracle as the stateless w02 rollup, now validating the
      // persistent store's cascade.
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-w20").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        val policy = RetentionPolicy(
          Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"), policy)
        store.updateMany(
          events(s, dir).select(col("metric"), col("tsec").as("ts"),
            col("value"), col("seq")),
          Now)
        store.levelData(1)
          .select(col("metric"), col("interval"), round(col("value"), 4).as("value"))
          .orderBy("metric", "interval")
      },
      rollupSql("round(avg(value), 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w21_ingest_incremental",
      // incremental-maintenance gate: the SAME oracle as a cold full
      // rollup, but reached through TWO updateMany batches split at a
      // 60s boundary that is NOT 300-aligned (1705276860 % 300 = 60) —
      // the level-1 window spanning the split is written from batch 1's
      // partial data, then MUST be recomputed (touched-window cascade,
      // whisper.py:866-869) when batch 2 completes it. Any stale or
      // double-counted window hash-mismatches the oracle.
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft-w21").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        val policy = RetentionPolicy(
          Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"), policy)
        val ev = events(s, dir).select(col("metric"), col("tsec").as("ts"),
          col("value"), col("seq"))
        val splitT = 1705276860L // 2024-01-15T00:01:00Z
        store.updateMany(ev.where(col("ts") < splitT), Now)
        store.updateMany(ev.where(col("ts") >= splitT), Now)
        store.levelData(1)
          .select(col("metric"), col("interval"), round(col("value"), 4).as("value"))
          .orderBy("metric", "interval")
      },
      rollupSql("round(avg(value), 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w23_rollup_substituted",
      // the MATERIALIZED-VIEW read path, driver-gated: a level-0 window
      // aggregate (gated `last` shape) on a session with the
      // RollupSubstitution rule registered. The optimizer must rewrite it
      // to scan the store's level-1 table — the query REFUSES to run
      // unsubstituted, so both the rewrite firing and its values are
      // pinned by the same oracle as the recomputing w04. Bench-wise this
      // is the read side of the w20 ingest: rollup consumers pay a
      // pruned scan, not a re-aggregation of level 0.
      (s, dir) => {
        val store = w23Store(s, dir)
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(RollStep.toLong)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"),
              count(col("value")).as("known"))
            .where(col("known") > 0 &&
              col("known").cast("double") / lit(5.0) >= lit(Xff.toDouble))
            .select("metric", "interval", "value")
            .orderBy("metric", "interval")
          // force optimization inside the registered window and pin it:
          // a regressed (recomputing) plan is a hard failure, not a
          // silently-identical result
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w23: rollup substitution regressed — plan still aggregates level-0")
          q
        }
      },
      rollupPickSql("interval DESC", RollStep, 5, 0.5f)),
    QueryDef(
      "w24_rollup_trunc_substituted",
      // the date_trunc spelling of the materialized-view read path,
      // driver-gated like w23: `groupBy(metric, date_trunc('hour', ts))`
      // — the most common hand-written dashboard grouping — must rewrite
      // to scan the store's hourly level; the query refuses to run
      // unsubstituted and its values share the cold-rollup oracle.
      (s, dir) => {
        val store = w24Store(s, dir)
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .groupBy(col("metric"),
              date_trunc("hour", timestamp_seconds(col("interval"))).as("hour"))
            .agg(max_by(col("value"), col("interval")).as("value"))
            .orderBy("metric", "hour")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w24: date_trunc substitution regressed — plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |)
         |SELECT metric, make_timestamp(w * 1000000) AS hour, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |  FROM r
         |) WHERE rn = 1 ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w25_rollup_trunc_gated",
      // the GATED date_trunc spelling — an xff>0 dashboard restating the
      // store's gate over an hourly date_trunc grouping — must also
      // rewrite to the hourly level (whose rows ARE the gated window
      // aggregates). Driver-gated like w23/w24: refuses to run
      // unsubstituted; values oracle-checked against the gated recompute.
      (s, dir) => {
        val store = w25Store(s, dir)
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .groupBy(col("metric"),
              date_trunc("hour", timestamp_seconds(col("interval"))).as("hour"))
            .agg(max_by(col("value"), col("interval")).as("value"),
              count(col("value")).as("known"))
            .where(col("known") > 0 &&
              col("known").cast("double") / lit(60.0) >= lit(W25Xff.toDouble))
            .select("metric", "hour", "value")
            .orderBy("metric", "hour")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w25: gated date_trunc substitution regressed — plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |)
         |SELECT metric, make_timestamp(w * 1000000) AS hour, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn,
         |         count(value) OVER (PARTITION BY metric, w) AS known
         |  FROM r
         |) WHERE rn = 1 AND known * 1.0 / 60 >= ${W25Xff.toDouble}
         |ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w26_rollup_filtered_substituted",
      // whisper's FETCH shape as a SQL-style read — one metric, a
      // step-aligned [from, until) range, rollup granularity — must
      // substitute to a FILTERED hourly-level scan (metric is a group
      // key; aligned bounds cut on window edges, matching how fetch
      // aligns fromInterval/untilInterval). Driver-gated like w23/w24/
      // w25: refuses to run unsubstituted, values oracle-checked.
      (s, dir) => {
        val store = w24Store(s, dir) // xff=0 hourly `last` store
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val from = 1705276800L // 2024-01-15T00:00:00Z — hour-aligned
          val until = 1705881600L // 2024-01-22T00:00:00Z
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .where(col("metric") === "click" &&
              col("interval") >= lit(from) && col("interval") < lit(until))
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(3600L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"))
            .orderBy("metric", "interval")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w26: filtered substitution regressed — plan still aggregates level-0")
          // the carried filter must also SURVIVE the rewrite in-plan
          require(
            q.queryExecution.optimizedPlan.collect {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
            }.nonEmpty,
            "w26: carried predicates were dropped by the substitution")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |  WHERE metric = 'click'
         |    AND interval >= 1705276800 AND interval < 1705881600
         |)
         |SELECT metric, w AS interval, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |  FROM r
         |) WHERE rn = 1 ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w28_fetch_grid_substituted",
      // whisper __archive_fetch AS A SUBSTITUTED READ: the dense slot
      // grid (one row per hour in [from, until), null where the archive
      // has no window — whisper.py:959-972's null-padded vector) spelled
      // as a range left-joined onto the rollup aggregate. Catalyst
      // prunes the metric grouping from the aggregate's output under the
      // join; the PRUNED shape substitutes to the filtered hourly scan
      // and the grid join rides on top. Driver-gated like w23..w27.
      (s, dir) => {
        val store = w24Store(s, dir) // xff=0 hourly `last` store
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val from = 1705276800L // 2024-01-15T00:00:00Z — hour-aligned
          val until = 1705881600L // one week: 168 slots
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val agg = l0
            .where(col("metric") === "click" &&
              col("interval") >= lit(from) && col("interval") < lit(until))
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(3600L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"))
          val grid = s.range(from, until, 3600).select(col("id").as("interval"))
          val q = grid.join(agg, Seq("interval"), "left")
            .select(col("interval"), col("value"))
            .orderBy("interval")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w28: fetch-grid substitution regressed — plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |  WHERE metric = 'click'
         |    AND interval >= 1705276800 AND interval < 1705881600
         |), roll AS (
         |  SELECT w AS interval, value FROM (
         |    SELECT w, value,
         |           row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |    FROM r
         |  ) WHERE rn = 1
         |)
         |SELECT g.interval, roll.value
         |FROM range(1705276800, 1705881600, 3600) AS g(interval)
         |LEFT JOIN roll ON roll.interval = g.interval
         |ORDER BY 1""".stripMargin),
    QueryDef(
      "w29_rollup_having_counts",
      // a USER-chosen quality gate over rollups — HAVING count >= k,
      // not the store's xff gate (the store is ungated): the bare
      // 4-output aggregate substitutes from the level's exact counts
      // and the HAVING rides the substituted scan. Driver-gated like
      // w23..w28.
      (s, dir) => {
        val store = w24Store(s, dir) // xff=0 hourly `last` store, exact counts
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(3600L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"),
              count(col("value")).as("known"))
            .where(col("known") >= 4)
            .orderBy("metric", "interval")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w29: HAVING-over-counts substitution regressed — plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |)
         |SELECT metric, w AS interval, value, known FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn,
         |         count(value) OVER (PARTITION BY metric, w) AS known
         |  FROM r
         |) WHERE rn = 1 AND known >= 4 ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w30_hetero_substituted",
      // HETEROGENEOUS-policy substituted read, driver-gated: one store,
      // two retention families (click/view @ 300s, signup/error/purchase
      // @ 600s — whisper's storage-schemas.conf). A query PINNED to
      // same-policy metrics substitutes against that family's level even
      // though the store is not policy-uniform: the pinning IN-predicate
      // is carried onto the shared level directory's scan. Refuses to
      // run unsubstituted like w23..w29.
      (s, dir) => {
        val store = w30Store(s, dir)
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .where(col("metric").isin("click", "view"))
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(300L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"))
            .orderBy("metric", "interval")
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w30: heterogeneous pinned substitution regressed — " +
              "plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 300 AS w, interval, value
         |  FROM l0 WHERE metric IN ('click', 'view')
         |)
         |SELECT metric, w AS interval, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |  FROM r
         |) WHERE rn = 1 ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w31_hetero_multi_substituted",
      // MULTI-policy pinned substituted read, driver-gated: a pin
      // spanning TWO retention families rewrites to the UNION of
      // per-family substituted scans — click reads its family's 600s
      // rollup from level 1, signup/error from theirs at level 2 (each
      // family its own level choice + carried pin). The Grafana-panel
      // shape (one query mixing fast/slow metric families) that
      // previously refused and re-aggregated level-0. Refuses to run
      // unsubstituted like w23..w30.
      (s, dir) => {
        val store = w31Store(s, dir)
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .where(col("metric").isin("click", "signup", "error"))
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(600L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"))
            .orderBy("metric", "interval")
          val opt = q.queryExecution.optimizedPlan
          require(opt.collect {
            case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
          }.isEmpty,
            "w31: multi-policy pinned substitution regressed — " +
              "plan still aggregates level-0")
          require(opt.collect {
            case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
          }.nonEmpty,
            "w31: expected a union of per-family substituted scans")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 600 AS w, interval, value
         |  FROM l0 WHERE metric IN ('click', 'signup', 'error')
         |)
         |SELECT metric, w AS interval, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |  FROM r
         |) WHERE rn = 1 ORDER BY 1, 2""".stripMargin),
    QueryDef(
      "w27_rollup_topk_substituted",
      // TOP-K over the rollup read path — ORDER BY value LIMIT above the
      // matched aggregate ("which hours saw the highest reading"). The
      // rule rewrites the INNER Aggregate bottom-up, so the Sort/Limit
      // parents ride on the substituted level scan unchanged — physically
      // a TakeOrderedAndProject over the pruned scan, never a full sort
      // of a level-0 re-aggregation. Driver-gated like w23..w26; the
      // (value DESC, metric, interval) tie-break makes the top-k row set
      // deterministic for the oracle compare.
      (s, dir) => {
        val store = w24Store(s, dir) // xff=0 hourly `last` store
        // register stays in effect (idempotent): every later action on the
        // returned frame builds a fresh QueryExecution, and deregistering
        // here would hand it the unsubstituted recompute plan
        graft.plans.RollupSubstitution.register(s, store)
        locally {
          val l0 = store.levelData(0).select("metric", "interval", "value")
          val q = l0
            .groupBy(col("metric"),
              (col("interval") - col("interval") % lit(3600L)).as("interval"))
            .agg(max_by(col("value"), col("interval")).as("value"))
            .orderBy(col("value").desc, col("metric"), col("interval"))
            .limit(20)
          require(
            q.queryExecution.optimizedPlan.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty,
            "w27: top-k substitution regressed — plan still aggregates level-0")
          q
        }
      },
      s"""$baseSql, r AS (
         |  SELECT metric, interval - interval % 3600 AS w, interval, value FROM l0
         |)
         |SELECT metric, w AS interval, value FROM (
         |  SELECT metric, w, value,
         |         row_number() OVER (PARTITION BY metric, w ORDER BY interval DESC) AS rn
         |  FROM r
         |) WHERE rn = 1
         |ORDER BY value DESC, metric, interval LIMIT 20""".stripMargin),
    QueryDef(
      "w22_streaming_ingest",
      // the STREAMING write path against the same oracle: events staged
      // as 4 arrival-ordered files (repartitionByRange on seq → file
      // order == seq order, so cross-batch LWW == global LWW), streamed
      // through StreamingIngest.start one file per micro-batch — four
      // incremental updateMany rounds with touched-window cascades —
      // then the materialized level-1 must equal the cold-rollup oracle.
      (s, dir) => {
        val stage = java.nio.file.Files.createTempDirectory("graft-w22-src").toString
        events(s, dir)
          .select(col("metric"), col("tsec").as("ts"), col("value"), col("seq"))
          .repartitionByRange(4, col("seq"))
          .write.mode("overwrite").parquet(stage)
        val root = java.nio.file.Files.createTempDirectory("graft-w22").toString
        val store = new graft.store.MetricStore(s, root, numBuckets = 8)
        store.createAll(
          Seq("click", "view", "signup", "error", "purchase"),
          RetentionPolicy(
            Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f))
        val stream = s.readStream
          .schema("metric STRING, ts BIGINT, value DOUBLE, seq BIGINT")
          .option("maxFilesPerTrigger", "1")
          .parquet(stage)
          .selectExpr("metric", "timestamp_seconds(ts) AS ts", "value", "seq")
        val q = graft.streaming.StreamingIngest.start(
          stream, store,
          java.nio.file.Files.createTempDirectory("graft-w22-ckpt").toString,
          () => Now)
        q.awaitTermination(600000)
        store.levelData(1)
          .select(col("metric"), col("interval"), round(col("value"), 4).as("value"))
          .orderBy("metric", "interval")
      },
      rollupSql("round(avg(value), 4)", RollStep, 5, 0.5f)),
    QueryDef(
      "w16_retention_parse",
      (s, dir) => {
        import s.implicits._
        retentionSpecs
          .map { spec =>
            val a = Retention.parseRetentionDef(spec)
            (spec, a.secondsPerPoint.toLong, a.points.toLong, a.retention)
          }
          .toDF("spec", "seconds_per_point", "points", "retention")
          .orderBy("spec")
      },
      s"""SELECT * FROM (VALUES
         |  ('60:1440', CAST(60 AS BIGINT), CAST(1440 AS BIGINT), CAST(86400 AS BIGINT)),
         |  ('1h:7d', 3600, 168, 604800),
         |  ('10s:10h', 10, 3600, 36000),
         |  ('1m:30d', 60, 43200, 2592000),
         |  ('15m:8', 900, 8, 7200),
         |  ('1h:1y', 3600, 8760, 31536000),
         |  ('1s:1d', 1, 86400, 86400),
         |  ('7d:1y', 604800, 52, 31449600),
         |  ('10:2y', 10, 6307200, 63072000)
         |) AS t(spec, seconds_per_point, points, retention)
         |ORDER BY spec""".stripMargin
    ),
    QueryDef(
      "w17_policy_info",
      (s, dir) => {
        import s.implicits._
        infoPolicies.zipWithIndex
          .flatMap {
            case (p, pid) =>
              Header.infoRows(p).map { li =>
                (pid.toLong, li.level.toLong, li.secondsPerPoint, li.points,
                  li.retention, li.offset)
              }
          }
          .toDF("pid", "lvl", "spp", "pts", "retention", "offset")
          .orderBy("pid", "lvl")
      },
      s"""WITH a AS (SELECT * FROM (VALUES
         |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(60 AS BIGINT)),
         |  (0, 1, 60, 60),
         |  (1, 0, 1, 60), (1, 1, 60, 60), (1, 2, 3600, 24), (1, 3, 86400, 365),
         |  (2, 0, 60, 1440)
         |) AS t(pid, lvl, spp, pts))
         |SELECT pid, lvl, spp, pts, spp * pts AS retention,
         |  CAST(16 + 12 * count(*) OVER (PARTITION BY pid)
         |     + 12 * coalesce(sum(pts) OVER (PARTITION BY pid ORDER BY lvl
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset
         |FROM a ORDER BY pid, lvl""".stripMargin
    ),
    QueryDef(
      "w18_size_estimate",
      (s, dir) => {
        import s.implicits._
        infoPolicies.zipWithIndex
          .map {
            case (p, pid) =>
              (pid.toLong, Retention.estimateFileSize(p.levels),
                Retention.estimateDiskSize(p.levels))
          }
          .toDF("pid", "file_size", "disk_size")
          .orderBy("pid")
      },
      s"""WITH a AS (SELECT * FROM (VALUES
         |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(60 AS BIGINT)),
         |  (0, 1, 60, 60),
         |  (1, 0, 1, 60), (1, 1, 60, 60), (1, 2, 3600, 24), (1, 3, 86400, 365),
         |  (2, 0, 60, 1440)
         |) AS t(pid, lvl, spp, pts))
         |SELECT pid, CAST(16 + 12 * count(*) + 12 * sum(pts) AS BIGINT) AS file_size,
         |       CAST(ceil((16 + 12 * count(*) + 12 * sum(pts)) / 4096.0) * 4096 AS BIGINT) AS disk_size
         |FROM a GROUP BY pid ORDER BY pid""".stripMargin
    ),
    QueryDef(
      "w19_aggregate_kernels",
      (s, dir) => {
        import s.implicits._
        import AggregationMethod._
        val v = Seq(1.0, 2.0, 3.0, 4.0)
        val rows = Seq(
          (0L, "average", aggregate(Average, v)),
          (1L, "sum", aggregate(Sum, v)),
          (2L, "last", aggregate(Last, v)),
          (3L, "max", aggregate(Max, v)),
          (4L, "min", aggregate(Min, v)),
          (5L, "avg_zero",
            aggregate(AvgZero, v, Some(v.map(Some(_)) ++ Seq.fill(4)(None)))),
          (6L, "absmax", aggregate(AbsMax, Seq(-3.0, -2.0, 1.0, 2.0))),
          (7L, "absmax", aggregate(AbsMax, Seq(-2.0, -1.0, 2.0, 3.0))),
          (8L, "absmin", aggregate(AbsMin, Seq(-3.0, -2.0, 1.0, 2.0))),
          (9L, "absmin", aggregate(AbsMin, Seq(-2.0, -1.0, 2.0, 3.0)))
        )
        rows.toDF("case_id", "method", "result").orderBy("case_id")
      },
      s"""SELECT * FROM (VALUES
         |  (CAST(0 AS BIGINT), 'average', CAST(2.5 AS DOUBLE)),
         |  (1, 'sum', 10.0),
         |  (2, 'last', 4.0),
         |  (3, 'max', 4.0),
         |  (4, 'min', 1.0),
         |  (5, 'avg_zero', 1.25),
         |  (6, 'absmax', -3.0),
         |  (7, 'absmax', 3.0),
         |  (8, 'absmin', 1.0),
         |  (9, 'absmin', -1.0)
         |) AS t(case_id, method, result)
         |ORDER BY case_id""".stripMargin
    )
  )
}
