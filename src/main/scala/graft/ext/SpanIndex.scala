package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted benchmark gram-position index for span-level
  * decontamination at ingest time: build once over the eval sets a
  * training run must never see, then check every corpus delivery
  * against it — the streaming face of
  * [[Dedup.charGramSpansAgainst]] / d29.
  *
  * Unlike the corpus indexes ([[MinHashIndex]], [[SemanticIndex]],
  * [[FingerprintIndex]]) this one has NO append/compact lifecycle: an
  * eval set is a fixed artifact, so the index is one immutable parquet
  * table (`positions/` — the occurrence-capped (id, i, g) sample) plus
  * a `_params` file pinning the gram space (k, prefix, maxOccur). A new
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
    Files.write(Paths.get(path, "_params"),
      s"k=$k\nmaxOccur=$maxOccur\nprefix=$prefix\n"
        .getBytes(StandardCharsets.UTF_8))
    new SpanIndex(bench.sparkSession, path, k, prefix, maxOccur)
  }

  /** Open a persisted index; the gram-space parameters come from its
    * `_params` file, never from the caller.
    */
  def load(spark: SparkSession, path: String): SpanIndex = {
    val params = new String(Files.readAllBytes(Paths.get(path, "_params")),
      StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(a, b) = l.split("=", 2); (a.trim, b.trim) }
      .toMap
    new SpanIndex(spark, path, params("k").toInt, params("prefix"),
      params("maxOccur").toInt)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
