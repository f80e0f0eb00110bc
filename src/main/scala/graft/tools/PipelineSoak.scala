package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{FingerprintIndex, LineIndex, MinHashIndex}
import graft.streaming.StreamingCorpusPipeline

/** Long-run soak for the COMPOSED corpus constructor
  * ([[StreamingCorpusPipeline]]): drive N micro-batches through the
  * full gauntlet — quality → exact (index + in-batch) → near-dup
  * (index + in-batch) — and record per-batch wall plus the combined
  * file/segment counts of BOTH persisted indexes, with and without
  * in-stream compaction.
  *
  * The claim under test is the same flatness contract as
  * [[DedupSoak]], now for the two-index composition: per-batch cost
  * bounded by batch size, never stream age; compaction keeps the
  * combined file count bounded while the uncompacted run accretes two
  * segment directories per batch (one per index).
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.71,"csec":0.0,"files":60,"segs":4}
  * and a first-10 vs last-10 summary per mode.
  *
  * Usage: runMain graft.tools.PipelineSoak [batches] [docsPerBatch] [compactEvery]
  *   compactEvery 0 runs all three modes (no-compact, compact-every-5,
  *   line-stage-every-5); -N runs ONLY the line mode compacting every N.
  */
object PipelineSoak {

  private def docText(salt: Long, i: Long): String = {
    var h = salt * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL
    (0 until 12).map { _ =>
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      s"w${java.lang.Long.toUnsignedString(h % 50000)}"
    }.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(150)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .appName("graft-pipeline-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String, table: String): Int =
      Option(new java.io.File(s"$path/$table").listFiles)
        .getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    // keep = ≥ 3 words: the 10% short-text rows fail, everything else
    // passes — the gate stays live without dominating the verdict mix
    val cfg = StreamingCorpusPipeline.Config(
      tau = 0.5,
      quality = d => d.select(col("doc_id"),
        when(size(split(col("text"), "\\s+")) >= 3, 1).otherwise(0)
          .as("keep")))

    // the recurring boilerplate the "line" mode plants in every doc —
    // the line stage must shed it each batch without the wall growing
    val banner = "subscribe to the daily digest newsletter"

    def run(mode: String, every: Int, withLine: Boolean = false): Unit = {
      val fpPath = Files.createTempDirectory(s"psoak-fp-$mode").toString
      val mhPath = Files.createTempDirectory(s"psoak-mh-$mode").toString
      val vPath = Files.createTempDirectory(s"psoakv-$mode").toString
      val lnOpt =
        if (!withLine) None
        else {
          val p = Files.createTempDirectory(s"psoak-ln-$mode").toString
          LineIndex.build(Seq((-1L, banner)).toDF("doc_id", "text"), p)
          Some(p)
        }
      val seed = (0 until 500).map(i => (i.toLong, docText(-1L, i)))
        .toDF("doc_id", "text")
      FingerprintIndex.build(seed, fpPath)
      MinHashIndex.build(seed, mhPath)
      def withBanner(t: String): String =
        if (withLine) banner + "\n" + t else t
      val walls = (0 until batches).map { b =>
        // 80% fresh, 10% quality-fails, 5% exact dups of the seed, 5%
        // in-batch exact dups — every gauntlet stage works each batch.
        // In "line" mode every substantive doc carries the banner line,
        // so the seed-dup class convicts ONLY because cleaning restores
        // the seed text (the d62 binding, soaked over stream age).
        val fresh = (0 until perBatch * 8 / 10).map(i =>
          (b * 100000L + i, withBanner(docText(b.toLong, i))))
        val short = (0 until perBatch / 10).map(i =>
          (b * 100000L + 40000L + i, "x y"))
        val seedDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 50000L + i, withBanner(docText(-1L, (b + i) % 500))))
        val batchDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 60000L + i, withBanner(docText(b.toLong, i))))
        val docs = (fresh ++ short ++ seedDup ++ batchDup)
          .toDF("doc_id", "text")
        val t0 = System.nanoTime()
        StreamingCorpusPipeline.processBatch(docs, b.toLong, fpPath, mhPath,
          None, vPath, cfg, lnPath = lnOpt)
        val sec = (System.nanoTime() - t0) / 1e9
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            val folds = (0 until b - 1).map(i => s"b$i")
            FingerprintIndex.load(spark, fpPath).compact(folds)
            MinHashIndex.load(spark, mhPath).compact(folds)
            lnOpt.foreach(p => LineIndex.load(spark, p).compact(folds)): Unit
            (System.nanoTime() - tc) / 1e9
          } else 0.0
        val files = countFiles(new java.io.File(fpPath)) +
          countFiles(new java.io.File(mhPath)) +
          lnOpt.map(p => countFiles(new java.io.File(p))).getOrElse(0)
        val segs = countSegs(mhPath, "bands") + countSegs(fpPath, "fps") +
          lnOpt.map(countSegs(_, "lines")).getOrElse(0)
        println(f"""{"mode":"$mode","batch":$b,"sec":$sec%.2f,"csec":$csec%.2f,"files":$files,"segs":$segs}""")
        sec
      }
      val span = math.max(math.min(10, walls.size / 2), 1)
      val head = walls.take(span).sum / span
      val tail = walls.takeRight(span).sum / span
      println(f"""{"mode":"$mode","first_mean":$head%.2f,"last_mean":$tail%.2f,"ratio":${tail / head}%.2f}""")
    }

    if (compactEvery > 0) run("compact", compactEvery)
    else if (compactEvery < 0) run("line", -compactEvery, withLine = true)
    else {
      run("none", 0); run("compact", 5)
      run("line", 5, withLine = true)
    }
    spark.stop()
  }
}
