package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Curation

/** Diagnostic for the prefixSums two-phase scan at scale: the rank must
  * be an exact permutation 1..n per source (so Σ copies == Σ quotas,
  * a closed-form integer), run over run. Prints the expected total and
  * three measured totals per op — any drift is the offsets/cum passes
  * disagreeing on shard assignment.
  */
object PrefixSumCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-prefixsum-check")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Tail label from the tens digit, not id % 5: id % 10 == 9 implies
    // id % 5 == 4, which would collapse the 5 tails into one source and
    // weaken the permutation check to a 2-source shape.
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 9, lit("crawl"))
        .otherwise(concat(lit("s"), expr("id DIV 10") % 5)).as("source"))
      .cache()
    docs.count()
    val target = n * 3 / 2

    // closed-form expected total: quotas from exact source counts
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wsum = sizes.values.map(math.sqrt(_)).sum
    val expected = sizes.values.map { m =>
      math.floor(target.toDouble *
        BigDecimal(math.sqrt(m) / wsum)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    }.sum
    println(s"""{"expected_total":$expected}""")

    for (i <- 1 to 3) {
      val s1 = Curation.upsampleQuotas(docs, 0.5, target)
        .agg(sum("copies")).head.getLong(0)
      val s2 = Curation.upsampleInterleaveOrder(docs, 0.5, target).count()
      // rank-permutation check: per source, ranks must be exactly 1..n
      val badRanks = Curation.upsampleQuotas(docs, 0.0, n)
        .groupBy("source")
        .agg(count(lit(1)).as("c"), max("rk").as("mx"),
          countDistinct("rk").as("d"))
        .where(col("c") =!= col("mx") || col("c") =!= col("d"))
        .count()
      println(s"""{"iter":$i,"sum_copies":$s1,"interleave_rows":$s2,"bad_rank_sources":$badRanks}""")
    }
    spark.stop()
  }
}
