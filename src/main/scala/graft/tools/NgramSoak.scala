package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ext.NgramIndex
import graft.streaming.StreamingNgramStats

/** Long-run soak for the incremental n-gram statistics — the
  * heavy-hitter member of the [[LineSoak]]/[[DedupSoak]] family: drive
  * N micro-batches through [[StreamingNgramStats.processBatch]]
  * (append + per-delivery top-K snapshot) and record, per batch, the
  * wall time and the index's file/segment counts — with and without
  * segment compaction.
  *
  * The claim under test (`NgramIndex.scala` contract): append cost is
  * one map-side-combinable aggregate of the BATCH (batch-vocabulary-
  * sized output), independent of corpus size or stream age; the
  * snapshot adds a groupBy-sum over segment partials, which grows only
  * with segment COUNT (listing + partial-merge width), not corpus age —
  * so without compaction the snapshot drifts with the accreting `seg=`
  * directories, and folding every K batches flattens it.
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.61,"csec":0,"files":42,"segs":3}
  * and a summary line per mode comparing first-10 vs last-10 mean wall.
  *
  * Usage: runMain graft.tools.NgramSoak [batches] [docsPerBatch] [compactEvery]
  *   compactEvery 0 runs both modes (no-compact, then compact-every-5).
  */
object NgramSoak {

  /** Deterministic 12-word doc, unique per (salt, i): ~20% of its words
    * come from a 200-word hot pool (the heavy hitters every batch
    * feeds) and the rest from a 50k-word cold pool — so the merged
    * statistics have a stable head AND a vocabulary that grows with
    * stream age, the regime where per-batch flatness is non-trivial.
    */
  private def docText(salt: Long, i: Long): String = {
    var h = salt * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL
    (0 until 12).map { j =>
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      val u = java.lang.Long.toUnsignedString(h >>> 1)
      if (j % 5 == 0) s"hot${(h >>> 1) % 200}" else s"w${u.take(10)}"
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
      .appName("graft-ngram-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String): Int =
      Option(new java.io.File(s"$path/grams").listFiles).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    def run(mode: String, every: Int): (Double, Double) = {
      val idxPath = Files.createTempDirectory(s"ngramsoak-$mode").toString
      val snapPath = Files.createTempDirectory(s"ngramsoakv-$mode").toString
      // seed: 500 docs sharing the hot pool with every later batch
      NgramIndex.build(
        (0 until 500).map(i => (i.toLong, docText(-1L, i))).toDF("doc_id", "text"),
        idxPath, n = 2)
      val walls = (0 until batches).map { b =>
        val docs = (0 until perBatch)
          .map(i => (b * 100000L + i, docText(b.toLong, i)))
          .toDF("doc_id", "text")
        val t0 = System.nanoTime()
        StreamingNgramStats.processBatch(docs, b.toLong, idxPath,
          snapshotPath = Some(snapPath))
        val sec = (System.nanoTime() - t0) / 1e9
        // fold timed separately — the flatness claim is about per-batch
        // cost; the fold is the LSM-style amortized line item
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            NgramIndex.load(spark, idxPath)
              .compact((0 until b - 1).map(i => s"b$i")): Unit
            (System.nanoTime() - tc) / 1e9
          } else 0.0
        val files = countFiles(new java.io.File(idxPath))
        val segs = countSegs(idxPath)
        println(f"""{"mode":"$mode","batch":$b,"sec":$sec%.2f,"csec":$csec%.2f,"files":$files,"segs":$segs}""")
        sec
      }
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
