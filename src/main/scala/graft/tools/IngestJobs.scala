package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{ArchiveInfo, RetentionPolicy}

/** Per-job attribution for the bench's x00/x01 ingest evidence: prints
  * every Spark job fired by each phase with its wall time and call site,
  * so "x01 has more jobs than x00" is a list of named jobs, not a guess.
  *
  * Usage: runMain graft.tools.IngestJobs [sfDir]
  */
object IngestJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = scala.collection.mutable.Buffer.empty[(Int, String, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(j.stageInfos.lastOption.map(s =>
            s.name + " <- " + j.stageInfos.map(_.name.takeWhile(_ != ' ')).mkString(",")))
          .getOrElse("?")
        jobs.put(j.jobId, (site, System.nanoTime())); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (site, t0) =>
          done.synchronized {
            done += ((j.jobId, site, (System.nanoTime() - t0) / 1e9)); ()
          }
        }
      }
    })
    val metrics = Seq("click", "view", "signup", "error", "purchase")
    val policy = RetentionPolicy(
      Seq(ArchiveInfo(60, 50000), ArchiveInfo(300, 20000)), xff = 0.5f)
    val now = graft.queries.WhisperQueries.Now
    val lastDay = 1706486400L
    val ev = graft.queries.WhisperQueries.events(spark, sfDir)
      .select(col("metric"), col("tsec").as("ts"), col("value"), col("seq"))
      .cache()
    ev.count()
    // warmup pass (untimed, unprinted)
    locally {
      val wroot = java.nio.file.Files.createTempDirectory("ij-warm").toString
      val ws = new graft.store.MetricStore(spark, wroot, 8)
      ws.createAll(metrics, policy)
      ws.updateMany(ev.where(col("ts") < lastDay), now)
      ws.updateMany(ev.where(col("ts") >= lastDay), now)
    }
    Thread.sleep(500)
    def phase(name: String)(f: => Unit): Unit = {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener bus
      println(f"== $name: $dt%.3f s, ${done.size} jobs")
      done.synchronized(done.toSeq).sortBy(_._1).foreach { case (id, site, sec) =>
        println(f"   job $id%3d $sec%7.3f s  $site")
      }
    }
    val root = java.nio.file.Files.createTempDirectory("ij").toString
    val store = new graft.store.MetricStore(spark, root, 8)
    store.createAll(metrics, policy)
    phase("x00_ingest_full")(store.updateMany(ev.where(col("ts") < lastDay), now))
    phase("x01_ingest_second_batch")(store.updateMany(ev.where(col("ts") >= lastDay), now))
    spark.stop()
  }
}
