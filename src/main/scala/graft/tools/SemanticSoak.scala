package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ext.SemanticIndex
import graft.streaming.StreamingSemanticDedup

/** Long-run soak for the incremental SEMANTIC dedup — the embedding
  * twin of [[DedupSoak]]: drive N micro-batches through
  * [[StreamingSemanticDedup.processBatch]] and record, per batch, the
  * wall time and the index's file/segment counts — with and without
  * segment compaction.
  *
  * The claim under test (`SemanticIndex.scala` contract): per-batch
  * cost is |batch| × avg cell size, never corpus size or stream AGE.
  * Without compaction the members table accretes one `seg=` directory
  * (times its `cell=` sub-dirs) per batch, so listing grows with age;
  * with folding every K batches it stays bounded by cadence.
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.61,"csec":0,"files":42,"segs":3}
  * and a summary line per mode comparing first-10 vs last-10 mean wall.
  *
  * Usage: runMain graft.tools.SemanticSoak [batches] [vecsPerBatch] [compactEvery]
  *   compactEvery 0 runs both modes (no-compact, then compact-every-5).
  */
object SemanticSoak {

  private val Dim = 16

  /** Deterministic unit-ish vector per (salt, i): mixed-hash components
    * in [-1, 1] — no RNG state between calls, same vector every run.
    */
  private def vec(salt: Long, i: Long): Array[Float] = {
    var h = salt * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL
    Array.fill(Dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      ((h % 2000) / 1000.0f)
    }
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
      .appName("graft-semantic-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String): Int =
      Option(new java.io.File(s"$path/members").listFiles).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    def run(mode: String, every: Int): (Double, Double) = {
      val idxPath = Files.createTempDirectory(s"semsoak-$mode").toString
      val vPath = Files.createTempDirectory(s"semsoakv-$mode").toString
      // seed corpus: 500 vectors, salt -1 (disjoint from every batch),
      // 16 cells — the clustered production shape
      SemanticIndex.build(
        (0 until 500).map(i => (i.toLong, vec(-1L, i))).toDF("vec_id", "embedding"),
        idxPath, nlist = 16)
      val walls = (0 until batches).map { b =>
        // 90% fresh vectors, 5% exact dups of the seed corpus, 5%
        // in-batch dups — every verdict path exercised each batch
        val fresh = (0 until perBatch * 9 / 10).map(i =>
          (b * 100000L + i, vec(b.toLong, i)))
        val seedDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 50000L + i, vec(-1L, (b + i) % 500)))
        val batchDup = (0 until perBatch / 20).map(i =>
          (b * 100000L + 60000L + i, vec(b.toLong, i)))
        val embDf = (fresh ++ seedDup ++ batchDup).toDF("vec_id", "embedding")
        val t0 = System.nanoTime()
        StreamingSemanticDedup.processBatch(embDf, b.toLong, idxPath, vPath,
          tau = 0.95)
        val sec = (System.nanoTime() - t0) / 1e9
        // fold timed separately — the flatness claim is about per-batch
        // dedup cost; the fold is the LSM-style amortized line item
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            SemanticIndex.load(spark, idxPath)
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
