package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Unigram}

/** Scale evidence for the unigram-LM trainer — [[BpeScale]]'s claim for
  * the EM loop: training cost ∝ dictionary, never corpus. Word-soup
  * corpora from a fixed 50k-word vocabulary at n and 10n documents give
  * the SAME dictionary, so seeding + every EM round + the executor-side
  * encode should stay flat while only the one-time corpus scan grows.
  *
  * Prints one JSON line per scale:
  *   {"n":100000,"dict_rows":50002,"scan_sec":1.0,"train_sec":4.2,
  *    "encode_sec":0.8,"pieces":812}
  *
  * Usage: runMain graft.tools.UnigramScale [nBase] [emIters] [seedSize]
  */
object UnigramScale {

  private def word(id: org.apache.spark.sql.Column, j: Int) =
    concat(lit("w"), pmod(xxhash64(id, lit(j)), lit(50000L)).cast("string"))

  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val emIters = args.lift(1).map(_.toInt).getOrElse(3)
    val seedSize = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-unigram-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // first scale is the JIT warmup (the BpeScale lesson)
    for (n <- Seq(nBase / 10, nBase, nBase * 10)) {
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j => word(col("id"), j)): _*).as("text"))
      val t0 = System.nanoTime()
      val dictRows = Bpe.wordDict(docs).count()
      val scanSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val trained = Unigram.train(docs, maxPieceLen = 6,
        seedSize = seedSize, emIters = emIters)
      val trainSec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      trained.dict.count(): Unit
      val encodeSec = (System.nanoTime() - t2) / 1e9
      println(f"""{"n":$n,"dict_rows":$dictRows,"scan_sec":$scanSec%.2f,"train_sec":$trainSec%.2f,"encode_sec":$encodeSec%.2f,"pieces":${trained.pieces.size}}""")
    }
    spark.stop()
  }
}
