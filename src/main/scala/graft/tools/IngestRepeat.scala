package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{ArchiveInfo, RetentionPolicy}

/** Repeat the bench's x00/x01 ingest-evidence measurement N times on
  * fresh stores to see the run-to-run distribution (the single bench
  * sample sits near the x00/x01 crossover at sf0.1, where fixed job
  * costs dominate both phases).
  *
  * Usage: runMain graft.tools.IngestRepeat [sfDir] [reps]
  */
object IngestRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = Seq("click", "view", "signup", "error", "purchase")
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f)
    val now = graft.queries.WhisperQueries.Now
    val lastDay = 1706486400L
    val ev = graft.queries.WhisperQueries.events(spark, sfDir)
      .select(col("metric"), col("tsec").as("ts"), col("value"), col("seq"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = (0 until (reps + 1)).map { r =>
      val root = java.nio.file.Files.createTempDirectory(s"ir-$r").toString
      val store = new graft.store.MetricStore(spark, root, 8)
      store.createAll(metrics, policy)
      val a = timed(store.updateMany(ev.where(col("ts") < lastDay), now))
      val b = timed(store.updateMany(ev.where(col("ts") >= lastDay), now))
      (a, b)
    }.drop(1) // first rep = warmup
    results.zipWithIndex.foreach { case ((a, b), i) =>
      println(f"rep $i: x00=$a%.3f x01=$b%.3f  ratio=${b / a}%.2f")
    }
    val (as, bs) = (results.map(_._1), results.map(_._2))
    println(f"x00 min=${as.min}%.3f med=${as.sorted.apply(as.size / 2)}%.3f")
    println(f"x01 min=${bs.min}%.3f med=${bs.sorted.apply(bs.size / 2)}%.3f")
    spark.stop()
  }
}
