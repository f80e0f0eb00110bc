package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Adversarial-boilerplate probe for the dedup cap/keeper stages: the
  * skew-hardening claim (see capGramFreq's note in ext/Dedup.scala) is
  * that a line or gram present in EVERY document — a license header, a
  * site banner — costs roughly the same as a benign corpus, because no
  * stage gathers a universal key's row mass into one task. This probe
  * measures exactly that contrast on synthetic corpora large enough for
  * a hotspot to show as wall time:
  *
  *   - `lines`: n docs × 8 unique md5 lines, benign vs the same corpus
  *     with one 32-char banner line appended to EVERY doc (the banner
  *     has n occurrences — the old row_number-window keeper sorted all
  *     of them in one task; the struct-min aggregate collapses them
  *     map-side);
  *   - `grams`: m docs × ~200 unique chars, benign vs the same with a
  *     shared 200-char banner substring in every doc (every banner gram
  *     has df = m — the old collect_set-window df cap materialized an
  *     O(m) id set per banner gram in one task; the (g, id)-spread
  *     aggregate never gathers them).
  *
  * Output: one JSON line per cell {probe, variant, n, rows, sec}.
  * Deterministic hash-derived text, no RNG state.
  *
  * Measured (local[32], defaults): lines 0.26 s benign vs 0.23 s
  * bannered; grams 4.33 s benign vs 4.17 s bannered — universal
  * boilerplate costs the same as none. The bannered gram cell reports a
  * few hundred genuine runs: docs sharing the trailing hex char(s) of
  * their body before the common banner form real shared 16-char
  * substrings (suffix + banner prefix) in df ≈ n/16^c cliques small
  * enough to pass the cap — the adversarial corpus exercises the pair
  * path too, which is the point.
  *
  * Usage: runMain graft.tools.SkewProbe [nLines] [nGrams]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nLines = args.headOption.map(_.toInt).getOrElse(100000)
    val nGrams = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-skew-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = body
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def report(probe: String, variant: String, n: Int, rows: Long,
               sec: Double): Unit =
      println(f"""{"probe":"$probe","variant":"$variant","n":$n,"rows":$rows,"sec":$sec%.2f}""")

    // ---- line probe -----------------------------------------------------
    // 8 unique lines per doc (md5(doc, j) hex = 32 chars ≥ minLen)
    val uniqueLines = transform(sequence(lit(0), lit(7)),
      j => md5(concat(col("id").cast("string"), lit(":"), j.cast("string"))))
    val benignLines = spark.range(0, nLines.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        array_join(uniqueLines, "\n").as("text"))
      .cache()
    val banner = "ALL RIGHTS RESERVED BANNER LINE."
    val bannerLines = benignLines
      .select(col("doc_id"),
        concat(col("text"), lit("\n" + banner)).as("text"))
      .cache()
    benignLines.count(); bannerLines.count()
    // warm codegen on a slice so the timed cells compare fairly
    Dedup.dedupLines(benignLines.limit(1000), minLen = 10).count()
    val (lb, lbSec) = time(Dedup.dedupLines(benignLines, minLen = 10).count())
    report("lines", "benign", nLines, lb, lbSec)
    val (la, laSec) = time(Dedup.dedupLines(bannerLines, minLen = 10).count())
    report("lines", "banner_in_every_doc", nLines, la, laSec)

    // ---- gram probe -----------------------------------------------------
    // ~200 unique chars per doc (6 concatenated md5 hexes of (doc, j))
    val uniqueBody = array_join(transform(sequence(lit(0), lit(5)),
      j => md5(concat(lit("g"), col("id").cast("string"), j.cast("string")))), "")
    val bannerText = ("the quick brown fox jumps over the lazy dog " * 5)
      .take(200)
    val benignGrams = spark.range(0, nGrams.toLong, 1, 32)
      .select(col("id").as("doc_id"), uniqueBody.as("text"))
      .cache()
    val bannerGrams = spark.range(0, nGrams.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        concat(uniqueBody, lit(bannerText)).as("text"))
      .cache()
    benignGrams.count(); bannerGrams.count()
    Dedup.charGramRuns(benignGrams.limit(500), prefix = "0").count()
    val (gb, gbSec) = time(Dedup.charGramRuns(benignGrams, prefix = "0").count())
    report("grams", "benign", nGrams, gb, gbSec)
    val (ga, gaSec) = time(Dedup.charGramRuns(bannerGrams, prefix = "0").count())
    report("grams", "banner_in_every_doc", nGrams, ga, gaSec)

    spark.stop()
  }
}
