package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ext.MinHashIndex
import graft.streaming.StreamingDedup

/** Long-run soak for the incremental corpus dedup: drive N micro-batches
  * through [[StreamingDedup.processBatch]] (the batch-backfill entry —
  * identical keeper semantics to the stream, precise per-batch walls)
  * and record, per batch, the wall time and the index's file/segment
  * counts — with and without segment compaction.
  *
  * The claim under test (`MinHashIndex.scala` contract): per-batch cost
  * is bounded by |batch| × collided buckets, never corpus size or
  * stream AGE. Without compaction the index accretes one segment
  * directory per batch per table, so file listing grows linearly with
  * age and eventually dominates small batches. With `compact()` folding
  * everything older than the previous batch every K batches, file
  * counts — and so per-batch wall — stay flat.
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.61,"files":42,"segs":3}
  * (files = parquet data files under the index; segs = segment dirs of
  * the bands table) and a summary line per mode comparing first-10 vs
  * last-10 mean wall.
  *
  * Usage: runMain graft.tools.DedupSoak [batches] [docsPerBatch] [compactEvery]
  *   compactEvery 0 runs both modes (no-compact, then compact-every-5).
  */
object DedupSoak {

  /** Deterministic 12-word doc text: unique per (salt, i) — word stream
    * seeded by a mixed hash so no RNG state is carried between calls.
    */
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
      .appName("graft-dedup-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String): Int =
      Option(new java.io.File(s"$path/bands").listFiles).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    def run(mode: String, every: Int): (Double, Double) = {
      val idxPath = Files.createTempDirectory(s"soak-$mode").toString
      val vPath = Files.createTempDirectory(s"soakv-$mode").toString
      // seed corpus: 500 docs, salt -1 (disjoint from every batch)
      MinHashIndex.build(
        (0 until 500).map(i => (i.toLong, docText(-1L, i))).toDF("doc_id", "text"),
        idxPath)
      val walls = (0 until batches).map { b =>
        // 90% fresh docs, 5% dups of the seed corpus, 5% in-batch dups —
        // every verdict path exercised each batch
        val fresh = (0 until perBatch * 9 / 10).map(i =>
          (b * 100000L + i, docText(b.toLong, i)))
        val seedDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 50000L + i, docText(-1L, (b + i) % 500)))
        val batchDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 60000L + i, docText(b.toLong, i)))
        val docs = (fresh ++ seedDup ++ batchDup).toDF("doc_id", "text")
        val t0 = System.nanoTime()
        StreamingDedup.processBatch(docs, b.toLong, idxPath, vPath, tau = 0.5)
        val sec = (System.nanoTime() - t0) / 1e9
        // the fold is timed SEPARATELY: the flatness claim is about the
        // per-batch dedup cost; the fold's own cost is O(base + folds)
        // every K batches — the LSM-style amortization a reader should
        // see priced on its own line
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            // fold everything strictly older than the previous batch —
            // the compactCommitted boundary when the checkpoint has
            // committed through batch b-1
            val tc = System.nanoTime()
            MinHashIndex.load(spark, idxPath)
              .compact((0 until b - 1).map(i => s"b$i")): Unit
            (System.nanoTime() - tc) / 1e9
          } else 0.0
        val files = countFiles(new java.io.File(idxPath))
        val segs = countSegs(idxPath)
        println(f"""{"mode":"$mode","batch":$b,"sec":$sec%.2f,"csec":$csec%.2f,"files":$files,"segs":$segs}""")
        sec
      }
      // honest means for short runs: sample count = what was taken, and
      // the two windows never overlap (take/takeRight share batches when
      // batches < 20, which would pin the ratio at ~1 regardless of growth)
      val span = math.max(math.min(10, walls.size / 2), 1)
      val head = walls.take(span).sum / span
      val tail = walls.takeRight(span).sum / span
      println(f"""{"mode":"$mode","first_mean":$head%.2f,"last_mean":$tail%.2f,"ratio":${tail / head}%.2f}""")
      (head, tail)
    }

    if (compactEvery > 0) run("compact", compactEvery)
    else { run("none", 0); run("compact", 5) }
    spark.stop()
  }
}
