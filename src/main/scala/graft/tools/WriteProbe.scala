package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-profile of the store's level-0 bulk write: the same routed
  * frame written under varied file layouts and parquet knobs, to
  * attribute x00's dominant job (≈1.5–1.7 s for ~2 MB of rows at sf0.1)
  * between shuffle, per-file writer overhead, and commit protocol.
  *
  * Usage: runMain graft.tools.WriteProbe [sfDir]
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = graft.queries.WhisperQueries.events(spark, sfDir)
      .select(col("metric"), col("tsec").cast("long").as("interval"),
        col("value"), col("seq").cast("long"))
      .withColumn("pb", pmod(hash(col("metric")), lit(8)))
      .withColumn("tb", expr("interval div 61440"))
      .cache()
    println(s"rows=${ev.count()}")

    def tmp(): String =
      java.nio.file.Files.createTempDirectory("wp").toString

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warmup
    ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
      .partitionBy("pb", "tb").parquet(tmp())

    for (round <- 1 to 2) {
      println(s"-- round $round")
      time("A baseline repartition(pb,tb)+partitionBy") {
        ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
          .partitionBy("pb", "tb").parquet(tmp())
      }
      time("B no shuffle: partitionBy from 32 cache parts") {
        ev.write.mode(SaveMode.Overwrite)
          .partitionBy("pb", "tb").parquet(tmp())
      }
      time("C small parquet buffers (block 1M, page 64k)") {
        ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
          .option("parquet.block.size", 1L << 20)
          .option("parquet.page.size", 64 << 10)
          .partitionBy("pb", "tb").parquet(tmp())
      }
      time("D uncompressed") {
        ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
          .option("compression", "none")
          .partitionBy("pb", "tb").parquet(tmp())
      }
      time("E flat: no partitionBy, 32 files") {
        ev.repartition(32).write.mode(SaveMode.Overwrite).parquet(tmp())
      }
      time("F flat: 1 file") {
        ev.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp())
      }
      time("G repartition(tb)+partitionBy(tb) only (16 dirs)") {
        ev.repartition(col("tb")).write.mode(SaveMode.Overwrite)
          .partitionBy("tb").parquet(tmp())
      }
      time("H v2 committer") {
        ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy("pb", "tb").parquet(tmp())
      }
      time("I parallel per-pb jobs (5 futures)") {
        val root = tmp()
        val pbs = ev.select("pb").distinct().collect().map(_.getInt(0))
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val fs = pbs.map { p =>
          Future {
            ev.where(col("pb") === p).repartition(col("tb"))
              .write.mode(SaveMode.Overwrite)
              .partitionBy("tb").parquet(s"$root/pb=$p")
          }
        }
        fs.foreach(Await.result(_, Duration.Inf))
      }
      time("J job-only: count the repartitioned frame") {
        ev.repartition(col("pb"), col("tb")).count()
      }
      time("K no summary/success markers") {
        spark.sparkContext.hadoopConfiguration
          .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        ev.repartition(col("pb"), col("tb")).write.mode(SaveMode.Overwrite)
          .partitionBy("pb", "tb").parquet(tmp())
      }
      // restore: K's setting must not leak into the next round's A–J
      spark.sparkContext.hadoopConfiguration
        .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
    }
    spark.stop()
  }
}
