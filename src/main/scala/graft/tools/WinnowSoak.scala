package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ext.WinnowIndex
import graft.streaming.StreamingWinnowDedup

/** Long-run soak for the incremental winnow dedup — [[DedupSoak]]'s
  * harness pointed at [[StreamingWinnowDedup.processBatch]], completing
  * the flatness-evidence set {MinHash (DedupSoak), line (LineSoak),
  * semantic (SemanticSoak), winnow}: per-batch wall bounded by batch
  * size (never stream age) with in-stream compaction, age-linear file
  * counts without.
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.61,"csec":0.0,"files":42,"segs":3}
  * and a first-N vs last-N summary per mode.
  *
  * Usage: runMain graft.tools.WinnowSoak [batches] [docsPerBatch] [compactEvery]
  *   compactEvery 0 runs both modes (no-compact, then compact-every-5).
  */
object WinnowSoak {

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
      .appName("graft-winnow-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String): Int =
      Option(new java.io.File(s"$path/fps").listFiles).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    def run(mode: String, every: Int): Unit = {
      val idxPath = Files.createTempDirectory(s"wsoak-$mode").toString
      val vPath = Files.createTempDirectory(s"wsoakv-$mode").toString
      WinnowIndex.build(
        (0 until 500).map(i => (i.toLong, docText(-1L, i))).toDF("doc_id", "text"),
        idxPath)
      val walls = (0 until batches).map { b =>
        // 90% fresh, 5% exact dups of the seed, 5% in-batch dups —
        // cross, in-batch, and kept verdicts all live each batch
        val fresh = (0 until perBatch * 9 / 10).map(i =>
          (b * 100000L + i, docText(b.toLong, i)))
        val seedDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 50000L + i, docText(-1L, (b + i) % 500)))
        val batchDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 60000L + i, docText(b.toLong, i)))
        val docs = (fresh ++ seedDup ++ batchDup).toDF("doc_id", "text")
        val t0 = System.nanoTime()
        StreamingWinnowDedup.processBatch(docs, b.toLong, idxPath, vPath, tau = 0.5)
        val sec = (System.nanoTime() - t0) / 1e9
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            WinnowIndex.load(spark, idxPath)
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
    }

    if (compactEvery > 0) run("compact", compactEvery)
    else { run("none", 0); run("compact", 5) }
    spark.stop()
  }
}
