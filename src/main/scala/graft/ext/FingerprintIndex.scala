package graft.ext

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-dedup corpus index: the canonical-content
  * fingerprints ([[TextAnalysis.fingerprint]]) of every kept document,
  * segment-partitioned like its near-dup siblings — completing the
  * {exact, MinHash, semantic} × {batch, incremental} dedup matrix.
  * "Has this delivery's content been kept before, byte-for-byte up to
  * case/punctuation/whitespace?" is the FIRST filter a training-data
  * pipeline runs (it is the cheapest and removes the most), and it must
  * not rescan history to answer.
  *
  * One parquet table under `path`: `fps/seg=<s>/` (id, fp). The batch
  * cross-check is a bare equi-join on the 128-bit fingerprint — AQE
  * broadcasts the batch side, the corpus side streams, nothing
  * quadratic anywhere. Appends are overwrite-per-segment
  * ([[MinHashIndex.append]] contract: replayed micro-batches rewrite
  * their own segment, so index maintenance is exactly-once), a
  * replaying batch hides its own segment via `excludeSeg`, and
  * [[compact]]/[[compactCommitted]] fold committed history through the
  * shared [[SegmentedTable]] protocol.
  */
final class FingerprintIndex private[ext] (val spark: SparkSession,
                                           val path: String) {

  private def fps(excludeSeg: Option[String]): DataFrame = {
    val raw = spark.read.parquet(s"$path/fps")
    excludeSeg.fold(raw)(s => raw.where(col("seg") =!= s))
      .select(col("id"), col("fp"))
  }

  private def fingerprints(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))

  /** Exact-duplicate cross-check of a new batch against the indexed
    * corpus: one row per (batch doc, indexed doc) sharing a
    * fingerprint. A doc re-delivered under an indexed id matches
    * itself, like the near-dup indexes.
    *
    * @return (doc_id, dup_of, fp)
    */
  def dedupBatch(newDocs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 excludeSeg: Option[String] = None): DataFrame =
    fingerprints(newDocs, idCol, textCol).as("x")
      .join(fps(excludeSeg).as("y"), col("x.fp") === col("y.fp"))
      .select(col("x.id").as("doc_id"), col("y.id").as("dup_of"),
        col("x.fp").as("fp"))

  /** Write a batch's fingerprints into segment `seg` (overwrite that
    * segment only — replay-idempotent).
    */
  def append(newDocs: DataFrame, seg: String, idCol: String = "doc_id",
             textCol: String = "text"): Unit = {
    fingerprints(newDocs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/fps/seg=$seg")
    SegmentedTable.refreshParent(spark, s"$path/fps")
  }

  /** Fold appended segments into `base` ([[SegmentedTable.compact]];
    * rows preserved verbatim — every verdict identical before/after).
    */
  def compact(folds: Seq[String]): Seq[String] =
    SegmentedTable.compact(spark, s"$path/fps", "seg", "base", folds,
      Seq("id", "fp"))

  /** Fold every `b<batchId>` segment strictly older than the
    * checkpoint's newest committed batch (replay-safe boundary).
    */
  def compactCommitted(checkpoint: String): Seq[String] = {
    val committed = SegmentedTable.committedBatches(checkpoint)
    if (committed.size < 2) Nil
    else compact(committed.init.map(b => s"b$b"))
  }
}

object FingerprintIndex {

  /** Build and persist over a kept corpus (replaces anything at `path`). */
  def build(docs: DataFrame, path: String, idCol: String = "doc_id",
            textCol: String = "text"): FingerprintIndex = {
    SegmentedTable.deleteRecursively(new java.io.File(path))
    Files.createDirectories(Paths.get(path))
    val idx = new FingerprintIndex(docs.sparkSession, path)
    idx.append(docs, seg = "base", idCol = idCol, textCol = textCol)
    idx
  }

  def load(spark: SparkSession, path: String): FingerprintIndex =
    new FingerprintIndex(spark, path)
}
