package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Curation

/** Measures the temperature-mixing family at synthetic scale: quota
  * computation + rank (`upsampleQuotas`), per-copy epoch explosion
  * (`upsampleInterleaveOrder`), and shard assignment (`epochShards`) on
  * a 90%-skewed corpus — the Zipfian shape real crawls have, and the
  * regime the two-phase prefixSums rank exists for (the hot source must
  * spread across shards instead of serializing one reducer). The
  * upsample target is 1.5× the corpus so the tail sources genuinely
  * multi-epoch while the head downsamples — both faces live, repeats
  * materializing through the per-shard explode.
  *
  * {{{ sbt "runMain graft.tools.MixScale [rows]" }}}
  */
object MixScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-mix-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 90% of docs in one crawl source, the rest across 5 curated tails.
    // The tail label must come from a digit INDEPENDENT of the 90/10
    // split: id % 10 == 9 forces id % 5 == 4, which would collapse all
    // tails into one source — use the tens digit instead.
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 9, lit("crawl"))
        .otherwise(concat(lit("s"), expr("id DIV 10") % 5)).as("source"))
      .cache()
    docs.count()
    val target = n * 3 / 2

    def time(label: String)(thunk: => Long): Unit = {
      thunk // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val out = thunk
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"""{"op":"$label","rows":$n,"out_rows":${runs.head._2},"sec":$med%.2f,"runs":[${runs.map(r => f"${r._1}%.2f").mkString(",")}]}""")
    }

    time("upsampleQuotas") {
      Curation.upsampleQuotas(docs, tau = 0.5, target = target)
        .agg(sum("copies")).head.getLong(0)
    }
    time("upsampleInterleaveOrder") {
      Curation.upsampleInterleaveOrder(docs, tau = 0.5, target = target)
        .count()
    }
    time("epochShards") {
      Curation.epochShards(docs, tau = 0.5, target = target, nShards = 64)
        .groupBy("shard").count().agg(sum("count")).head.getLong(0)
    }

    // Physical-writer pricing (r11 verdict #5): writeEpochShards sorts
    // each shard in ONE task by contract (one internally-ordered file
    // per shard) — price that task across shard counts so the
    // S-selection rule is a measured number. Per S: wall, total task
    // spill (memory+disk), per-shard file-size spread, file count.
    // ~190-char deterministic text gives the sort/write real mass
    // (10M rows ≈ 2 GB of payload at the default row count).
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled): Unit
          }
        }
      })
    val textDocs = docs.withColumn("text",
      repeat(md5(col("doc_id").cast("string")), 6))
    for (s <- Seq(16, 64, 256)) {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-mix-shards").toString
      spill.set(0)
      val t0 = System.nanoTime()
      Curation.writeEpochShards(textDocs, tau = 0.5, target = target,
        nShards = s, path = out)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the async listener bus before reading
      val dirs = Option(new java.io.File(out).listFiles).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      val fileSizes = dirs.flatMap(d =>
        Option(d.listFiles).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length))
      println(f"""{"op":"writeEpochShards","rows":$n,"shards":$s,"sec":$sec%.2f,"spill_mb":${spill.get / 1048576},"files":${fileSizes.length},"file_mb_min":${if (fileSizes.isEmpty) 0L else fileSizes.min / 1048576},"file_mb_max":${if (fileSizes.isEmpty) 0L else fileSizes.max / 1048576}}""")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
    spark.stop()
  }
}
