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
    // "full" runs the d85 capstone config (every optional stage live,
    // compacting every 5); integers keep the original mode semantics
    val compactEvery = args.lift(2).filter(_ != "full").map(_.toInt).getOrElse(0)
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

    /** Deterministic CENTERED 16-dim embedding per doc id (the full
      * mode's semantic stage input — stage live, matches rare by
      * design: uncentered positive vectors would all sit at cos ≈ 0.75
      * and the semantic stage would gut every batch).
      */
    def docEmb(id: Long): Array[Float] =
      Array.tabulate(16)(k => (((id * 31 + k * 7) % 97) - 48).toFloat / 97f)

    def run(mode: String, every: Int, withLine: Boolean = false,
            full: Boolean = false): Unit = {
      val fpPath = Files.createTempDirectory(s"psoak-fp-$mode").toString
      val mhPath = Files.createTempDirectory(s"psoak-mh-$mode").toString
      val vPath = Files.createTempDirectory(s"psoakv-$mode").toString
      val lnOpt =
        if (!(withLine || full)) None
        else {
          val p = Files.createTempDirectory(s"psoak-ln-$mode").toString
          LineIndex.build(Seq((-1L, banner)).toDF("doc_id", "text"), p)
          Some(p)
        }
      val seedRows = (0 until 500).map(i => (i.toLong, docText(-1L, i)))
      val seed = seedRows.toDF("doc_id", "text")
      // full mode: EVERY optional stage live (the d85 capstone's
      // config, soaked) — Bloom-gated exact, priorities on all three
      // text indexes, NFC, decontamination vs a 20-doc eval set,
      // winnow, semantic over synthetic 16-dim embeddings, ngram stats
      val (spOpt, smOpt, wnOpt, ngOpt) =
        if (!full) (None, None, None, None)
        else {
          val sp = Files.createTempDirectory(s"psoak-sp-$mode").toString
          val sm = Files.createTempDirectory(s"psoak-sm-$mode").toString
          val wn = Files.createTempDirectory(s"psoak-wn-$mode").toString
          val ng = Files.createTempDirectory(s"psoak-ng-$mode").toString
          graft.ext.SpanIndex.build(
            (0 until 20).map(i => (9000000L + i, docText(-2L, i)))
              .toDF("doc_id", "text"), sp)
          graft.ext.SemanticIndex.build(
            seedRows.map { case (id, _) => (id, docEmb(id)) }
              .toDF("vec_id", "embedding"), sm, nlist = 4, normalized = false)
          graft.ext.WinnowIndex.build(
            seed.withColumn("prio", lit(1.0)), wn, prioCol = Some("prio"))
          graft.ext.NgramIndex.build(seed, ng)
          (Some(sp), Some(sm), Some(wn), Some(ng))
        }
      val prioOpt = if (full) Some("prio") else None
      FingerprintIndex.build(seed.withColumn("prio", lit(1.0)), fpPath,
        bloom = full, prioCol = prioOpt)
      MinHashIndex.build(seed.withColumn("prio", lit(1.0)), mhPath,
        prioCol = prioOpt)
      val runCfg =
        if (!full) cfg
        else cfg.copy(bloomGate = true, normalizeForm = Some("NFC"),
          prioCol = Some("prio"), winTau = 0.4)
      def withBanner(t: String): String =
        if (withLine || full) banner + "\n" + t else t
      val walls = (0 until batches).map { b =>
        // 80% fresh, 10% quality-fails, 5% exact dups of the seed, 5%
        // in-batch exact dups — every gauntlet stage works each batch.
        // In "line" mode every substantive doc carries the banner line,
        // so the seed-dup class convicts ONLY because cleaning restores
        // the seed text (the d62 binding, soaked over stream age). The
        // full mode adds 2 planted eval-leak docs per batch so the
        // contamination stage convicts every batch, and seed dups get
        // prio 0 (trusted) so the elections run live.
        val fresh = (0 until perBatch * 8 / 10).map(i =>
          (b * 100000L + i, withBanner(docText(b.toLong, i)), 1.0))
        val short = (0 until perBatch / 10).map(i =>
          (b * 100000L + 40000L + i, "x y", 1.0))
        val seedDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 50000L + i, withBanner(docText(-1L, (b + i) % 500)),
            if (full && i % 2 == 0) 0.0 else 1.0))
        val batchDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 60000L + i, withBanner(docText(b.toLong, i)), 1.0))
        val leak =
          if (!full) Seq.empty
          else (0 until 2).map(i =>
            (b * 100000L + 70000L + i,
              withBanner(docText(-2L, (b + i) % 20) + s" uq$b$i"), 1.0))
        val rows = fresh ++ short ++ seedDup ++ batchDup ++ leak
        val docs =
          if (!full) rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
          else rows.map(r => (r._1, r._2, r._3, docEmb(r._1)))
            .toDF("doc_id", "text", "prio", "embedding")
        val t0 = System.nanoTime()
        StreamingCorpusPipeline.processBatch(docs, b.toLong, fpPath, mhPath,
          spOpt, vPath, runCfg, semPath = smOpt, winPath = wnOpt,
          lnPath = lnOpt, ngPath = ngOpt)
        val sec = (System.nanoTime() - t0) / 1e9
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            val folds = (0 until b - 1).map(i => s"b$i")
            FingerprintIndex.load(spark, fpPath).compact(folds)
            MinHashIndex.load(spark, mhPath).compact(folds)
            lnOpt.foreach(p => LineIndex.load(spark, p).compact(folds))
            wnOpt.foreach(p => graft.ext.WinnowIndex.load(spark, p).compact(folds))
            smOpt.foreach(p => graft.ext.SemanticIndex.load(spark, p).compact(folds))
            ngOpt.foreach(p => graft.ext.NgramIndex.load(spark, p).compact(folds)): Unit
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

    if (args.lift(2).contains("full")) run("full", 5, full = true)
    else if (compactEvery > 0) run("compact", compactEvery)
    else if (compactEvery < 0) run("line", -compactEvery, withLine = true)
    else {
      run("none", 0); run("compact", 5)
      run("line", 5, withLine = true)
    }
    spark.stop()
  }
}
