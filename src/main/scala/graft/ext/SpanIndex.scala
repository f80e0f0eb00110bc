package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted benchmark gram-position index for span-level
  * decontamination at ingest time: build once over the eval sets a
  * training run must never see, then check every corpus delivery
  * against it — the streaming face of
  * [[Dedup.charGramSpansAgainst]] / d29.
  *
  * Unlike the corpus indexes ([[MinHashIndex]], [[SemanticIndex]],
  * [[FingerprintIndex]]) this one has NO append/compact lifecycle: an
  * eval set is a fixed artifact, so the index is two immutable parquet
  * tables (`positions/` — the occurrence-capped (id, i, g) sample —
  * and `docs/` — the benchmark text, read by [[checkExact]]'s per-char
  * verify) plus a `_params` file pinning the gram space (k, prefix,
  * maxOccur). A new
  * benchmark version is a new `build` at a new path — versioning by
  * replacement, whisper's resize-then-swap shape rather than its ring
  * append.
  *
  * Scale: the index is eval-set-sized (small by nature) and BROADCASTS
  * into every check; the batch side pays its df-cap window and never
  * re-shuffles for the join. Per-delivery cost is independent of how
  * many deliveries came before — there is no accreting state at all.
  */
final class SpanIndex private[ext] (val spark: SparkSession, val path: String,
                                    val k: Int, val prefix: String,
                                    val maxOccur: Int) {

  /** The occurrence-capped benchmark gram-position table (id, i, g). */
  def positions: DataFrame = spark.read.parquet(s"$path/positions")

  /** Span-level contamination of a delivery against the indexed eval
    * sets: (idCol, bench_id, span, grams) per (batch doc, bench doc)
    * pair sharing a run of ≥ `minShared` sampled grams — see
    * [[Dedup.charGramSpansAgainst]] for the semantics and knobs. The
    * gram space (k, prefix, maxOccur) comes from the index's `_params`;
    * only the run knobs are per-call.
    */
  def check(batch: DataFrame, minShared: Long = 2, maxGramFreq: Long = 200,
            maxGap: Long = 64, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    Dedup.charGramSpansAgainst(batch, batch, k, prefix, minShared,
      maxGramFreq, maxGap, idCol, textCol,
      benchPositions = Some(positions), maxOccur = maxOccur)

  /** The persisted benchmark documents (idCol, textCol as built) — the
    * verify side of [[checkExact]]. Eval-set-sized, broadcastable.
    */
  def benchDocs: DataFrame = spark.read.parquet(s"$path/docs")

  /** [[check]] at EXACT extents: the sampled cross-table runs become
    * candidate regions and [[Dedup.exactifyRuns]] re-reads the leaked
    * characters against the index's persisted benchmark TEXT — so the
    * pipeline gate ("drop the doc if ≥ N contiguous chars of any eval
    * item appear") thresholds on exact numbers, not conservative
    * sampled ones. Verify cost is proportional to the candidate
    * regions the sample found — a clean delivery pays only the sampled
    * check.
    *
    * @return (idCol, bench_id, span, nruns) — per contaminated (batch
    *         doc, bench doc) pair, the EXACT longest leaked span (≥
    *         `minKeep` chars) and the count of exact leaked runs; pairs
    *         whose exact runs all fall below `minKeep` drop out
    */
  def checkExact(batch: DataFrame, minShared: Long = 2,
                 maxGramFreq: Long = 200, maxGap: Long = 64,
                 minKeep: Long = 16, slack: Long = 64,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val bd = benchDocs
    val cands = Dedup.charGramRunsAgainst(batch, bd, k, prefix, minShared,
      maxGramFreq, maxGap, idCol, textCol,
      benchPositions = Some(positions), maxOccur = maxOccur)
    Dedup.exactifyRuns(batch, cands, minKeep, slack,
        idCol = idCol, textCol = textCol, docsB = Some(bd))
      .groupBy(col("a").as(idCol), col("b").as("bench_id"))
      .agg(max(col("ext")).as("span"), count(lit(1)).as("nruns"))
  }
}

object SpanIndex {

  /** Build and persist the index over a benchmark corpus, replacing
    * whatever lived at `path` (a stale gram space must not survive into
    * the new one). The occurrence cap is applied at build time — the
    * capped table is what every check joins, so the window runs once
    * here, not per delivery (re-capping on read is idempotent: ranks
    * within an already-capped table never exceed the cap).
    */
  def build(bench: DataFrame, path: String, k: Int = 16,
            prefix: String = "0", maxOccur: Int = 8,
            idCol: String = "doc_id", textCol: String = "text"): SpanIndex = {
    deleteRecursively(new java.io.File(path))
    Files.createDirectories(Paths.get(path))
    Dedup.capOccurrences(
        Dedup.charGramPositions(bench, k, prefix, idCol, textCol), maxOccur)
      .write.mode("overwrite").parquet(s"$path/positions")
    // the benchmark text itself rides along (eval-set-sized): the
    // [[SpanIndex.checkExact]] per-char verify reads leaked characters
    // from it — positions alone cannot reconstruct extents exactly
    bench.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$path/docs")
    Files.write(Paths.get(path, "_params"),
      s"k=$k\nmaxOccur=$maxOccur\nprefix=$prefix\n"
        .getBytes(StandardCharsets.UTF_8))
    new SpanIndex(bench.sparkSession, path, k, prefix, maxOccur)
  }

  /** Open a persisted index; the gram-space parameters come from its
    * `_params` file, never from the caller.
    */
  def load(spark: SparkSession, path: String): SpanIndex = {
    val params = SegmentedTable.readParams(path)
    new SpanIndex(spark, path, params("k").toInt, params("prefix"),
      params("maxOccur").toInt)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
