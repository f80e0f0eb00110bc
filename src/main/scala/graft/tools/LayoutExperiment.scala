package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ArchiveInfo, RetentionPolicy}
import graft.ops.{Ingest, Rollup}

/** ROADMAP #5 decision harness: measure the store's CURRENT layout (one
  * parquet table per level → one dynamic-overwrite commit per level,
  * deferred/backgrounded) against a SINGLE table partitioned by
  * (level, pb, tb) where a whole batch — level-0 upsert plus cascade —
  * lands in ONE commit.
  *
  * The single-table side is a measurement PROTOTYPE for the bench policy
  * (60s → 300s, avg, xff=0.5), not a full store: the point is to price
  * the commit structure, and to record the numbers in ROADMAP.md before
  * any migration. Both sides ingest the same two batches the bench's
  * x00/x01 evidence uses (full history, then the last day), and the
  * prototype's level-1 is checked row-equal against the store's before
  * any timing is trusted.
  *
  * Usage: runMain graft.tools.LayoutExperiment [sfDir]
  * Output: one JSON line, {"x00_store":…,"x01_store":…,"x00_single":…,
  * "x01_single":…,"level1_equal":true}
  */
object LayoutExperiment {

  private val numBuckets = 8
  private def bucketSeconds(step: Int): Long = step.toLong * 1024

  private def withPart(df: DataFrame, step: Int): DataFrame =
    df.withColumn("pb", pmod(hash(col("metric")), lit(numBuckets)))
      .withColumn("tb", expr(s"interval div ${bucketSeconds(step)}"))

  /** LWW-merge two (metric, interval, value, known, vsum, pb, tb, level)
    * frames; higher prio wins whole-row.
    */
  private def lww(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val unioned = existing.withColumn("prio", lit(-1L))
      .unionByName(incoming.withColumn("prio", lit(0L)))
    unioned
      .groupBy("metric", "interval", "level", "pb", "tb")
      .agg(max_by(struct(col("value"), col("known"), col("vsum")), col("prio")).as("w"))
      .select(col("metric"), col("interval"), col("level"), col("pb"), col("tb"),
        col("w.value").as("value"), col("w.known").as("known"), col("w.vsum").as("vsum"))
  }

  private def readDirs(spark: SparkSession, base: String,
                       dirs: Seq[String]): Option[DataFrame] = {
    val present = dirs.filter(d => new java.io.File(d).exists())
    if (present.isEmpty) None
    else Some(
      spark.read.option("basePath", base).parquet(present: _*)
        .withColumn("pb", col("pb").cast("int"))
        .withColumn("tb", col("tb").cast("long"))
        .withColumn("level", col("level").cast("int")))
  }

  /** One batch into the single (level, pb, tb)-partitioned table: exactly
    * one parquet commit per batch, cold or incremental.
    */
  def singleIngest(spark: SparkSession, path: String, batch: DataFrame,
                   policy: RetentionPolicy, now: Long): Unit = {
    val steps = policy.levels.map(_.secondsPerPoint)
    val (s0, s1) = (steps(0), steps(1))
    val routed = Ingest.routeAndDedup(batch, policy, now).cache()
    try {
      val l0 = routed.where(col("level") === 0).select("metric", "interval", "value")
      val l0Counted = l0
        .withColumn("known", lit(1L)).withColumn("vsum", col("value"))
      if (!new java.io.File(path).exists()) {
        // cold: level 0 and its cascade in one plan, one commit
        val prop = Rollup.propagateTouchedCounted(
          l0, l0.select("metric", "interval"), s0, s1, policy.aggregation, policy.xff)
        withPart(l0Counted, s0).withColumn("level", lit(0))
          .unionByName(withPart(prop, s1).withColumn("level", lit(1)))
          .repartition(col("level"), col("pb"), col("tb"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("level", "pb", "tb").parquet(path)
        return
      }
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // stats pass: touched level-0 partitions + interval hull (one job)
      val stats = withPart(l0, s0).groupBy("pb", "tb")
        .agg(min("interval").as("lo"), max("interval").as("hi")).collect()
      if (stats.isEmpty) return
      val touched0 = stats.map(r => (r.getInt(0), r.getLong(1))).toSet
      val lo = stats.map(_.getLong(2)).min
      val hi = stats.map(_.getLong(3)).max
      // post-upsert level-0 content of the touched partitions
      val existing0 = readDirs(spark, path,
        touched0.toSeq.map { case (p, t) => s"$path/level=0/pb=$p/tb=$t" })
      val incoming0 = withPart(l0Counted, s0).withColumn("level", lit(0))
      val merged0 = existing0.map(lww(_, incoming0)).getOrElse(incoming0).cache()
      // windows needing recompute read the hull (touched ∪ edge partitions)
      val bs0 = bucketSeconds(s0)
      val (wLo, wHi) = (lo - lo % s1, hi - hi % s1 + s1)
      val hullDirs = for {
        pb <- 0 until numBuckets
        tb <- (wLo / bs0) to ((wHi - 1) / bs0)
      } yield s"$path/level=0/pb=$pb/tb=$tb"
      val untouchedDirs = hullDirs.filterNot(
        touched0.map { case (p, t) => s"$path/level=0/pb=$p/tb=$t" })
      val higher = readDirs(spark, path, untouchedDirs)
        .map(u => merged0.unionByName(u))
        .getOrElse(merged0)
        .where(col("interval") >= wLo && col("interval") < wHi)
        .select("metric", "interval", "value", "known", "vsum")
      val prop = withPart(
        Rollup.propagateTouchedCounted(
          higher, l0.select("metric", "interval"), s0, s1,
          policy.aggregation, policy.xff), s1)
        .withColumn("level", lit(1)).cache()
      val touched1 = prop.select("pb", "tb").distinct().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      val existing1 = readDirs(spark, path,
        touched1.toSeq.map { case (p, t) => s"$path/level=1/pb=$p/tb=$t" })
      val merged1 = existing1.map(lww(_, prop)).getOrElse(prop)
      // ONE dynamic-overwrite commit for both levels
      merged0.unionByName(merged1)
        .repartition(col("level"), col("pb"), col("tb"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("level", "pb", "tb").parquet(path)
      merged0.unpersist(blocking = true); prop.unpersist(blocking = true)
      ()
    } finally routed.unpersist(blocking = true)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, sfDir) finally spark.stop()
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def run(spark: SparkSession, sfDir: String): Unit = {
    val metrics = Seq("click", "view", "signup", "error", "purchase")
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f)
    val now = graft.queries.WhisperQueries.Now
    val lastDay = 1706486400L // 2024-01-29T00:00:00Z, the bench's x01 split
    val ev = graft.queries.WhisperQueries.events(spark, sfDir)
      .select(col("metric"), col("tsec").as("ts"), col("value"), col("seq"))
      .cache()
    ev.count()

    // JIT/codegen warmup on a small slice for BOTH layouts, untimed
    val warmSlice = ev.where(col("seq") % 97 === 0)
    locally {
      val wroot = java.nio.file.Files.createTempDirectory("layout-warm-a").toString
      val ws = new graft.store.MetricStore(spark, wroot, numBuckets)
      ws.createAll(metrics, policy)
      ws.updateMany(warmSlice.where(col("ts") < lastDay), now)
      ws.updateMany(warmSlice.where(col("ts") >= lastDay), now)
      val wsingle = java.nio.file.Files.createTempDirectory("layout-warm-b").toString + "/t"
      singleIngest(spark, wsingle, warmSlice.where(col("ts") < lastDay), policy, now)
      singleIngest(spark, wsingle, warmSlice.where(col("ts") >= lastDay), policy, now)
    }

    // A: current per-level store
    val rootA = java.nio.file.Files.createTempDirectory("layout-store").toString
    val store = new graft.store.MetricStore(spark, rootA, numBuckets)
    store.createAll(metrics, policy)
    val x00a = timed(store.updateMany(ev.where(col("ts") < lastDay), now))
    val x01a = timed(store.updateMany(ev.where(col("ts") >= lastDay), now))

    // B: single-table prototype
    val pathB = java.nio.file.Files.createTempDirectory("layout-single").toString + "/t"
    val x00b = timed(singleIngest(spark, pathB, ev.where(col("ts") < lastDay), policy, now))
    val x01b = timed(singleIngest(spark, pathB, ev.where(col("ts") >= lastDay), policy, now))

    // equivalence gate: identical level-1 rows (value to 1e-9), else the
    // timings compare different work
    val a1 = store.levelData(1)
      .select(col("metric"), col("interval"), round(col("value"), 9).as("value"))
    val b1 = spark.read.parquet(pathB).where(col("level") === 1)
      .select(col("metric"), col("interval"), round(col("value"), 9).as("value"))
    val equal = a1.count() == b1.count() &&
      a1.except(b1).isEmpty && b1.except(a1).isEmpty

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"x00_store":${f(x00a)},"x01_store":${f(x01a)},""" +
      s""""x00_single":${f(x00b)},"x01_single":${f(x01b)},""" +
      s""""level1_equal":$equal,"sf":"$sfDir"}""")
  }
}
