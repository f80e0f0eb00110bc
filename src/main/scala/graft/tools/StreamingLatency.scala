package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.AggregationMethod
import graft.streaming.StreamingIngest

/** Latency benchmark for the two streaming rollup paths (ROADMAP):
  *
  *   - `rollupStateful` (update mode): flatMapGroupsWithState emits a
  *     PROVISIONAL consolidated value for every touched window each
  *     micro-batch, then the watermark timeout emits the final value —
  *     downstream sees rollups at micro-batch latency;
  *   - `rollupStream` in APPEND mode: the plain watermarked window
  *     aggregate — a window's (single, final) row is emitted only once
  *     the watermark passes window end + lateness.
  *
  * The feed is event-time-ordered: each wave adds one `step`-worth of
  * slots per metric, then drains (processAllAvailable — the same
  * arrival-then-drain shape as a Trigger.AvailableNow restart per wave).
  * After each wave we record how many (metric, window) rollups are
  * visible in the sink. The append path structurally lags by
  * ceil(lateness/step) windows; the stateful path is flat at one wave —
  * the numbers quantify what the refinement path buys and what it costs
  * per wave (state-store maintenance vs plain hash aggregation).
  *
  * Prints one JSON line per (mode, wave):
  *   {"mode":"stateful","wave":3,"visible":200,"sec":0.41}
  * and a summary line per mode with total wall and visibility lag.
  *
  * Usage: runMain graft.tools.StreamingLatency [metrics] [waves]
  */
object StreamingLatency {
  private val SourceStep = 60
  private val Step = 300
  private val LatenessSec = 600L // append path lags ceil(600/300)=2 windows
  private val T0 = 1706400000L

  def main(args: Array[String]): Unit = {
    val nMetrics = args.headOption.map(_.toInt).getOrElse(50)
    val waves = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      run(spark, "stateful", nMetrics, waves)
      run(spark, "append", nMetrics, waves)
      val cascadeRef = runStorePaths(spark, nMetrics, waves)
      runMixed(spark, nMetrics, waves, cascadeRef)
    } finally spark.stop()
  }

  /** One wave = `Step/SourceStep` slots for every metric, covering
    * exactly one rollup window: wave w spans [T0+w·Step, T0+(w+1)·Step).
    */
  private def waveRows(w: Int, nMetrics: Int): Seq[(String, Long, Double)] =
    for {
      m <- 0 until nMetrics
      s <- 0 until Step / SourceStep
    } yield (s"m$m", T0 + w.toLong * Step + s.toLong * SourceStep, (w + s).toDouble)

  private def run(spark: SparkSession, mode: String,
                  nMetrics: Int, waves: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("metric", "tsec", "value")
      .selectExpr("metric", "timestamp_seconds(tsec) AS ts", "value")
    val qname = s"lat_$mode"
    val q = mode match {
      case "stateful" =>
        StreamingIngest.rollupStateful(stream, SourceStep, Step,
          AggregationMethod.Average, xff = 0.5f, LatenessSec)
          .toDF().writeStream
          .format("memory").queryName(qname).outputMode("update").start()
      case "append" =>
        StreamingIngest.rollupStream(stream, SourceStep, Step,
          AggregationMethod.Average, xff = 0.5f, LatenessSec)
          .writeStream
          .format("memory").queryName(qname).outputMode("append").start()
    }
    var totalSec = 0.0
    val lags = Array.newBuilder[Int]
    (0 until waves).foreach { w =>
      mem.addData(waveRows(w, nMetrics): _*)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      totalSec += dt
      // update-mode sinks append refinements; count DISTINCT windows
      val visible = spark.table(qname)
        .selectExpr("metric", "interval").distinct().count()
      // windows fully fed so far = (w+1)·metrics; the shortfall is the
      // path's structural visibility lag, in windows per metric
      lags += ((w + 1) - (visible / nMetrics)).toInt
      println(f"""{"mode":"$mode%s","wave":$w%d,"visible":$visible%d,"sec":$dt%.3f}""")
    }
    q.stop()
    val lagTail = lags.result().drop(2) // skip xff warm-in of the first waves
    val steadyLag = if (lagTail.isEmpty) 0 else lagTail.max
    println(f"""{"mode":"$mode%s","metric":"summary","totalSec":$totalSec%.3f,""" +
      f""""steadyLagWindows":$steadyLag%d,"waves":$waves%d,"metrics":$nMetrics%d}""")
  }

  // ---- store-backed paths: batch cascade vs startStatefulAll ----------

  /** STORE-level comparison (ROADMAP round-6 #3): maintain a 3-level
    * store wave by wave through
    *
    *   - `cascade`: `updateMany` per wave — level-0 write + the
    *     touched-window cascade rewrites levels 1..2 in-batch;
    *   - `stateful-all`: level-0 write via `updateMany` on a
    *     SINGLE-level twin store (same work, no cascade) + one
    *     continuously-running stateful rollup query per coarse level
    *     (the `startStatefulAll` pipelines, kept running instead of
    *     Trigger.AvailableNow so one harness process can drive waves),
    *     each upserting exact (value, known, vsum) rows.
    *
    * Both sides pay the level-0 write, so the wall-time delta isolates
    * coarse-level maintenance: bucket-rewrite cascade vs narrow
    * state-store upserts. After the last wave the coarse levels of the
    * two stores must agree row-for-row (1e-9 tolerance for summation
    * order) — printed as `levelsMatch`.
    */
  private def runStorePaths(spark: SparkSession, nMetrics: Int,
                            waves: Int): graft.store.MetricStore = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.model.{ArchiveInfo, RetentionPolicy}
    import graft.store.MetricStore
    implicit val sqlCtx = spark.sqlContext

    val policy = RetentionPolicy(
      Seq(ArchiveInfo(SourceStep, 50000), ArchiveInfo(Step, 20000),
        ArchiveInfo(Step * 6, 5000)),
      xff = 0.5f, AggregationMethod.Average)
    val metrics = (0 until nMetrics).map(i => s"m$i")
    val now = T0 + waves.toLong * Step + 864000L
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    def waveDf(w: Int) = waveRows(w, nMetrics)
      .map { case (m, t, v) => (m, t, v, t) } // unique slots: seq = ts
      .toDF("metric", "ts", "value", "seq")

    // cascade path
    val storeA = new MetricStore(spark, tmp("lat-cascade"), numBuckets = 8)
    storeA.createAll(metrics, policy)
    var cascadeSec = 0.0
    (0 until waves).foreach { w =>
      val df = waveDf(w)
      val t0 = System.nanoTime()
      storeA.updateMany(df, now)
      val dt = (System.nanoTime() - t0) / 1e9
      cascadeSec += dt
      println(f"""{"mode":"cascade","wave":$w%d,"sec":$dt%.3f}""")
    }

    // stateful-all path: level-0 twin + per-level stateful upsert queries
    val storeB = new MetricStore(spark, tmp("lat-stateful"), numBuckets = 8)
    storeB.createAll(metrics, policy)
    val storeB0 = new MetricStore(spark, tmp("lat-stateful-l0"), numBuckets = 8)
    storeB0.createAll(metrics,
      RetentionPolicy(Seq(ArchiveInfo(SourceStep, 50000)), xff = 0.5f,
        AggregationMethod.Average))
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("metric", "tsec", "value")
      .selectExpr("metric", "timestamp_seconds(tsec) AS ts", "value")
    val queries = (1 until policy.levels.size).map { i =>
      val step = policy.levels(i).secondsPerPoint
      StreamingIngest.rollupStateful(stream, SourceStep, step,
        policy.aggregation, policy.xff, LatenessSec)
        .toDF()
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", tmp(s"lat-ck$i"))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty)
            storeB.upsertRollups(i,
              batch.select("metric", "interval", "value", "known", "vsum"))
        }
        .start()
    }
    var statefulSec = 0.0
    (0 until waves).foreach { w =>
      val df = waveDf(w)
      val t0 = System.nanoTime()
      storeB0.updateMany(df, now)
      mem.addData(waveRows(w, nMetrics): _*)
      queries.foreach(_.processAllAvailable())
      val dt = (System.nanoTime() - t0) / 1e9
      statefulSec += dt
      println(f"""{"mode":"stateful-all","wave":$w%d,"sec":$dt%.3f}""")
    }
    queries.foreach(_.stop())

    // end-state equality of the coarse levels (1e-9: summation order)
    val levelsMatch = (1 until policy.levels.size).forall { i =>
      val a = storeA.levelData(i).select(col("metric"), col("interval"),
        col("value"), col("known"))
      val b = storeB.levelData(i).select(col("metric"), col("interval"),
        col("value").as("bvalue"), col("known").as("bknown"))
      val joined = a.join(b, Seq("metric", "interval"), "full_outer")
      val bad = joined.where(
        col("value").isNull || col("bvalue").isNull ||
          abs(col("value") - col("bvalue")) > lit(1e-9) ||
          col("known") =!= col("bknown")).count()
      if (bad > 0)
        println(s"""{"mode":"stateful-all","level":$i,"mismatchedRows":$bad}""")
      bad == 0
    }
    println(f"""{"mode":"cascade","metric":"summary","totalSec":$cascadeSec%.3f,""" +
      f""""waves":$waves%d,"metrics":$nMetrics%d}""")
    println(f"""{"mode":"stateful-all","metric":"summary","totalSec":$statefulSec%.3f,""" +
      f""""waves":$waves%d,"metrics":$nMetrics%d,"levelsMatch":$levelsMatch%b}""")
    storeA
  }

  /** The MIGRATION deployment ([[StreamingIngest.startMixed]]'s shape,
    * VERDICT r5 #6): ONE store whose level 0 is fed by the batch upsert
    * with `cascade = false` and whose coarse levels are maintained by
    * the per-level stateful refinement queries — the cascade-backfill +
    * live-tail handoff a real migration runs. The harness mirrors
    * startMixed with continuously-running queries (same reason as
    * stateful-all: AvailableNow restarts per wave would time query
    * startup, not the path). Per wave it records wall cost and the TAIL
    * VISIBILITY LAG — fully-fed windows per metric not yet visible in
    * the store's first coarse level (the number a dashboard reading the
    * store experiences). End state is checked row-for-row against the
    * cascade-maintained reference store.
    */
  private def runMixed(spark: SparkSession, nMetrics: Int, waves: Int,
                       cascadeRef: graft.store.MetricStore): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.model.{ArchiveInfo, RetentionPolicy}
    import graft.store.MetricStore
    implicit val sqlCtx = spark.sqlContext

    val policy = RetentionPolicy(
      Seq(ArchiveInfo(SourceStep, 50000), ArchiveInfo(Step, 20000),
        ArchiveInfo(Step * 6, 5000)),
      xff = 0.5f, AggregationMethod.Average)
    val metrics = (0 until nMetrics).map(i => s"m$i")
    val now = T0 + waves.toLong * Step + 864000L
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    val store = new MetricStore(spark, tmp("lat-mixed"), numBuckets = 8)
    store.createAll(metrics, policy)
    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("metric", "tsec", "value")
      .selectExpr("metric", "timestamp_seconds(tsec) AS ts", "value")
    val queries = (1 until policy.levels.size).map { i =>
      val step = policy.levels(i).secondsPerPoint
      StreamingIngest.rollupStateful(stream, SourceStep, step,
        policy.aggregation, policy.xff, LatenessSec)
        .toDF()
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", tmp(s"lat-mixck$i"))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty)
            store.upsertRollups(i,
              batch.select("metric", "interval", "value", "known", "vsum"))
        }
        .start()
    }
    var mixedSec = 0.0
    val lags = Array.newBuilder[Int]
    (0 until waves).foreach { w =>
      val df = waveRows(w, nMetrics)
        .map { case (m, t, v) => (m, t, v, t) }
        .toDF("metric", "ts", "value", "seq")
      val t0 = System.nanoTime()
      store.updateMany(df, now, cascade = false)
      mem.addData(waveRows(w, nMetrics): _*)
      queries.foreach(_.processAllAvailable())
      val dt = (System.nanoTime() - t0) / 1e9
      mixedSec += dt
      val visible = store.levelData(1)
        .select("metric", "interval").distinct().count()
      val lag = ((w + 1) - (visible / nMetrics)).toInt
      lags += lag
      println(f"""{"mode":"mixed","wave":$w%d,"visible":$visible%d,"lag":$lag%d,"sec":$dt%.3f}""")
    }
    queries.foreach(_.stop())

    // handoff soundness: the mixed store's coarse levels equal the
    // cascade reference (1e-9: summation order)
    val levelsMatch = (1 until policy.levels.size).forall { i =>
      val a = cascadeRef.levelData(i).select(col("metric"), col("interval"),
        col("value"), col("known"))
      val b = store.levelData(i).select(col("metric"), col("interval"),
        col("value").as("bvalue"), col("known").as("bknown"))
      val joined = a.join(b, Seq("metric", "interval"), "full_outer")
      val bad = joined.where(
        col("value").isNull || col("bvalue").isNull ||
          abs(col("value") - col("bvalue")) > lit(1e-9) ||
          col("known") =!= col("bknown")).count()
      if (bad > 0)
        println(s"""{"mode":"mixed","level":$i,"mismatchedRows":$bad}""")
      bad == 0
    }
    val lagTail = lags.result().drop(2)
    val steadyLag = if (lagTail.isEmpty) 0 else lagTail.max
    println(f"""{"mode":"mixed","metric":"summary","totalSec":$mixedSec%.3f,""" +
      f""""steadyLagWindows":$steadyLag%d,"waves":$waves%d,"metrics":$nMetrics%d,""" +
      f""""levelsMatch":$levelsMatch%b}""")
  }
}
