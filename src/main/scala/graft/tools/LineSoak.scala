package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ext.LineIndex
import graft.streaming.StreamingLineDedup

/** Long-run soak for the incremental LINE dedup — the C4-boilerplate
  * twin of [[DedupSoak]]: drive N micro-batches through
  * [[StreamingLineDedup.processBatch]] and record, per batch, the wall
  * time and the index's file/segment counts — with and without segment
  * compaction. [[LineIndex]] shares [[graft.ext.SegmentedTable]] with
  * the MinHash/semantic indexes, whose soaks already proved flatness;
  * this run makes the claim first-party for the line family instead of
  * inherited (ROADMAP r9 candidate).
  *
  * The claim under test (`LineIndex.scala` contract): per-batch cost is
  * |batch lines| against an anti-join whose build side AQE prunes,
  * never corpus size or stream AGE. Without compaction the lines table
  * accretes one `seg=` directory per batch, so listing grows with age;
  * with folding every K batches it stays bounded by cadence.
  *
  * Prints one JSON line per batch:
  *   {"mode":"compact","batch":17,"sec":0.61,"csec":0,"files":42,"segs":3}
  * and a summary line per mode comparing first-10 vs last-10 mean wall.
  *
  * Usage: runMain graft.tools.LineSoak [batches] [docsPerBatch] [compactEvery]
  *   compactEvery 0 runs both modes (no-compact, then compact-every-5).
  */
object LineSoak {

  /** Deterministic ~40-char eligible line, unique per (salt, i) — word
    * stream seeded by a mixed hash so no RNG state between calls.
    */
  private def line(salt: Long, i: Long): String = {
    var h = salt * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL
    (0 until 6).map { _ =>
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      s"w${java.lang.Long.toUnsignedString(h % 50000)}"
    }.mkString(" ")
  }

  /** A doc is 8 lines: 5 fresh uniques, one boilerplate line the SEED
    * corpus indexed (index-hit path), one line shared across this
    * batch's docs (in-batch first-occurrence path), one short exempt
    * line — every cleaning path exercised in every doc.
    */
  private def docText(salt: Long, i: Long): String =
    ((0 until 5).map(j => line(salt, i * 8 + j)) ++
      Seq(line(-1L, (salt + i) % 100), // seed boilerplate
        line(salt * 7919 + 13, 0L),    // in-batch banner
        "ok")                          // short, exempt
      ).mkString("\n")

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(150)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .appName("graft-line-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def countFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(countFiles).sum
    }
    def countSegs(path: String): Int =
      Option(new java.io.File(s"$path/lines").listFiles).getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("seg="))

    def run(mode: String, every: Int): (Double, Double) = {
      val idxPath = Files.createTempDirectory(s"linesoak-$mode").toString
      val outPath = Files.createTempDirectory(s"linesoakv-$mode").toString
      // seed corpus: 500 docs whose lines include the 100 boilerplate
      // lines every batch re-sends (salt -1, disjoint from every batch)
      LineIndex.build(
        (0 until 500).map(i => (i.toLong, docText(-1L, i))).toDF("doc_id", "text"),
        idxPath)
      val walls = (0 until batches).map { b =>
        val docs = (0 until perBatch)
          .map(i => (b * 100000L + i, docText(b.toLong, i)))
          .toDF("doc_id", "text")
        val t0 = System.nanoTime()
        StreamingLineDedup.processBatch(docs, b.toLong, idxPath, outPath)
        val sec = (System.nanoTime() - t0) / 1e9
        // fold timed separately — the flatness claim is about per-batch
        // dedup cost; the fold is the LSM-style amortized line item
        val csec =
          if (every > 0 && b > 0 && b % every == 0) {
            val tc = System.nanoTime()
            LineIndex.load(spark, idxPath)
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
