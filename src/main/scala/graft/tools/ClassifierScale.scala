package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/** Scale evidence for the quality-classifier trainer
  * ([[TextAnalysis.trainLinear]]): full-batch GD is steps × one pass
  * over the CACHED sparse feature table, so per-step wall should grow
  * ~linearly with corpus size (it is a corpus scan — the honest cost)
  * while the one-time feature build (tokenize → hash → normalize →
  * repartition → cache) is paid once and amortizes across steps; and
  * the trained model must actually separate planted classes (the
  * quality bar a measured table keeps honest).
  *
  * Prints one JSON line per scale:
  *   {"n":100000,"build_sec":…,"per_step_sec":…,"steps":8,"auc":1.0}
  *
  * Usage: runMain graft.tools.ClassifierScale [nBase] [steps]
  */
object ClassifierScale {

  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val steps = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-classifier-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // planted classes: positives draw from a 30-word "pw" vocabulary,
    // negatives from a disjoint 30-word "nw" one — separable through
    // the 64 hashed-TF buckets the trainer actually uses (a class
    // signal spread over tens of thousands of types is invisible at
    // dim 64 by construction; quality classifiers model STYLE-sized
    // vocabularies, which is what this plants).
    def corpus(n: Long, off: Long) =
      spark.range(n).select((col("id") + off).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit(if (off == 0L) "pw" else "nw"),
            pmod(xxhash64(col("id"), lit(j)), lit(30L)).cast("string"))): _*)
          .as("text"))

    for (n <- Seq(nBase / 10, nBase, nBase * 10)) { // first row = JIT warmup
      val pos = corpus(n / 2L, 0L)
      val neg = corpus(n / 2L, 1000000000L)
      // time 1 step vs `steps`+1 steps: the delta isolates per-step cost
      // from the one-time feature build both runs pay
      val t0 = System.nanoTime()
      TextAnalysis.trainLinear(pos, neg, dim = 64, steps = 1): Unit
      val oneSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val m = TextAnalysis.trainLinear(pos, neg, dim = 64, steps = steps + 1)
      val fullSec = (System.nanoTime() - t1) / 1e9
      val perStep = (fullSec - oneSec) / steps
      // separation on a fresh sample of both classes
      val scored = TextAnalysis.scoreLinear(
        corpus(500L, 0L).unionByName(corpus(500L, 1000000000L)),
        m.weights, m.bias).collect()
        .map(r => (r.getLong(0) >= 1000000000L, r.getDouble(1)))
      val posS = scored.filter(!_._1).map(_._2)
      val negS = scored.filter(_._1).map(_._2)
      // exact AUC over the 500×500 sample (driver-side, fixed size)
      val auc = posS.map(p => negS.count(_ < p) +
        0.5 * negS.count(_ == p)).sum / (posS.length.toDouble * negS.length)
      println(f"""{"n":$n,"build_plus_1step_sec":$oneSec%.2f,"per_step_sec":$perStep%.3f,"steps":$steps,"auc":$auc%.4f}""")
    }
    spark.stop()
  }
}
