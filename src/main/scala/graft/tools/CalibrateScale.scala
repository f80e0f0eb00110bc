package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Curation

/** Measures the d40/d72 twin pair at synthetic scale: exact
  * `bucketByScore` (two-phase prefix-sum rank — a range shuffle of
  * every score) vs `bucketByScoreApprox` (one percentile_approx sketch
  * aggregate + a broadcast threshold join). The corpus is 90%-skewed to
  * one source — the Zipfian shape real crawls have — so the exact
  * path's range exchange and the approx path's map-side sketch are both
  * exercised where it matters. Also reports the tier agreement
  * fraction between the two, since the approx mode's contract is
  * "approximately equal tier populations", not row-identical tiers.
  *
  * {{{ sbt "runMain graft.tools.CalibrateScale [rows]" }}}
  */
object CalibrateScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-calibrate-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 90% of rows in one source; deterministic pseudo-random scores
    val scored = spark.range(n).select(
      when(col("id") % 10 < 9, lit("crawl"))
        .otherwise(concat(lit("s"), col("id") % 3)).as("source"),
      col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1000.0)
        .as("score"))
      .cache()
    scored.count()

    def time(label: String)(thunk: => Unit): Double = {
      thunk // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        thunk
        (System.nanoTime() - t0) / 1e9
      }
      val med = runs.sorted.apply(1)
      println(f"""{"op":"$label","rows":$n,"sec":$med%.2f,"runs":[${runs.map(r => f"$r%.2f").mkString(",")}]}""")
      med
    }

    val te = time("bucketByScore_exact") {
      Curation.bucketByScore(scored, buckets = 3)
        .agg(sum("tier")).collect(): Unit
    }
    val ta = time("bucketByScoreApprox") {
      Curation.bucketByScoreApprox(scored, buckets = 3)
        .agg(sum("tier")).collect(): Unit
    }

    val joined = Curation.bucketByScore(scored, buckets = 3)
      .select(col("doc_id"), col("tier").as("te"))
      .join(Curation.bucketByScoreApprox(scored, buckets = 3)
        .select(col("doc_id"), col("tier").as("ta")), "doc_id")
    val agree = joined.agg(
      avg(when(col("te") === col("ta"), 1.0).otherwise(0.0))).head.getDouble(0)
    println(f"""{"op":"summary","rows":$n,"exact_sec":$te%.2f,"approx_sec":$ta%.2f,"speedup":${te / ta}%.2f,"tier_agreement":$agree%.4f}""")
    spark.stop()
  }
}
