package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** At-scale pricing + recall probe for the SPAN family — the round-12
  * companion to the bench's new `sst` stage vectors: the fixture-scale
  * rows attribute cost, this measures how the stages SCALE and whether
  * the sampled candidate generation still finds real duplicated spans
  * when the corpus grows. Synthetic corpus of hash-derived word soup
  * (no accidental 16-char repeats across docs, so candidate pairs are
  * exactly the planted ones) with a 200-char span copied verbatim into
  * each of `n/20` doc PAIRS at different offsets — the Lee et al. 2021
  * shape: one duplicated substring, arbitrary alignment.
  *
  * Measures, at the given corpus size and word budget:
  *   - `candidates` = [[Dedup.charGramRuns]] (prefix "0" sampling, the
  *     production path) — wall + how many planted pairs the sample
  *     surfaced (expected ≈ all: ~12 sampled grams land in a 200-char
  *     run, maxGap 64 tolerates the ~16-char expected gaps);
  *   - `exactify` = [[Dedup.exactifyRuns]] over those candidates —
  *     wall + exact-run count (extents exact to the char);
  *   - `removal` = [[Dedup.removeSharedSpansGlobal]] reusing the same
  *     runs table — wall + how many docs shed characters (expected =
  *     one loser per planted pair: cluster-global keeps ONE copy).
  *
  * {{{ sbt "runMain graft.tools.SpanScale [docs]" }}}
  */
object SpanScale {

  private def words(seed: Long, i: Long, n: Int): String = {
    var h = seed * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL
    (0 until n).map { _ =>
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      s"w${java.lang.Long.toUnsignedString(h % 1000000)}"
    }.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-span-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ~60 words (~420 chars) per doc; pair (2i, 2i+1) of the first
    // n/10 docs shares a ~200-char planted span at different offsets
    val nPairs = n / 20
    val rows = (0 until n).map { i =>
      val base = words(1L, i.toLong, 60)
      if (i < 2 * nPairs) {
        val pair = i / 2
        val span = words(2L, pair.toLong, 28).take(200) // ~200 chars
        val cut = if (i % 2 == 0) 80 else 240           // different alignment
        (i.toLong, base.substring(0, cut) + " " + span + " " + base.substring(cut))
      } else (i.toLong, base)
    }
    val docs = rows.toDF("doc_id", "text").repartition(32).cache()
    val chars = docs.agg(sum(length(col("text")))).head.getLong(0)
    println(s"""{"docs":$n,"pairs":$nPairs,"chars":$chars}""")

    def time[T](thunk: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = thunk
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // candidates: the sampled production path, df/occurrence caps live
    val (tCand, runs) = time {
      val r = Dedup.charGramRuns(docs, k = 16, prefix = "0",
        minShared = 2, maxGramFreq = 200, maxGap = 64).cache()
      r.count()
      r
    }
    // planted recall: a pair counts found if any run links its two ids
    val found = runs
      .where(col("a") < lit(2L * nPairs) && col("b") < lit(2L * nPairs) &&
        col("b") - col("a") === 1L && (col("a") % 2) === 0L)
      .select("a").distinct().count()
    println(f"""{"op":"candidates","sec":$tCand%.2f,"runs":${runs.count()},"planted_found":$found,"planted":$nPairs}""")

    val (tEx, exact) = time {
      val e = Dedup.exactifyRuns(docs, runs, minKeep = 16, slack = 64).cache()
      e.count()
      e
    }
    println(f"""{"op":"exactify","sec":$tEx%.2f,"exact_runs":${exact.count()}}""")

    val (tRm, changed) = time {
      val cleaned = Dedup.removeSharedSpansGlobal(docs, minSpan = 48,
        runs = Some(runs))
      cleaned.as("c")
        .join(docs.as("d"), col("c.doc_id") === col("d.doc_id") &&
          length(col("c.text")) < length(col("d.text")))
        .count()
    }
    println(f"""{"op":"removal","sec":$tRm%.2f,"docs_shed":$changed}""")
    spark.stop()
  }
}
