package graft.ext

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Compaction for the `seg=`-partitioned parquet tables the incremental
  * indexes accrete ([[MinHashIndex.append]], [[Similarity.appendIvfIndex]],
  * [[Similarity.appendPqIndex]]): fold named segments into the base
  * segment so partition listing and file counts stay bounded by
  * compaction cadence, not stream age. Whisper's analog is the ring
  * buffer's fixed file count (reference `whisper.py:479-550` — storage
  * never fragments); a segment-per-micro-batch index needs an explicit
  * fold to make the same promise.
  *
  * Protocol: read base ∪ folds, write the merged rows to a dot-prefixed
  * sibling staging dir (invisible to Spark's file listing), delete the
  * folded partition dirs, then rename staging into place as the new base
  * — one parquet rewrite of (base + folds), zero rewrites of unfolded
  * segments. Run it QUIESCED (between micro-batches / with the stream
  * stopped): the delete→rename window is not atomic for concurrent
  * readers, matching the maintenance-op contract of
  * [[graft.store.MetricStore.resize]]'s swap.
  *
  * Replay safety is the CALLER's contract: never fold a segment a
  * restarted stream could replay (fold only batches strictly older than
  * the checkpoint's newest commit — [[MinHashIndex.compactCommitted]]
  * encodes that rule). A replayed batch excludes its OWN segment when it
  * re-reads the index; folding that segment into base would un-hide it
  * and flip the replay's verdicts.
  */
private[graft] object SegmentedTable {

  /** Fold `folds` partition directories of `tableDir` into `partCol=baseVal`.
    *
    * @param cols data columns to carry (the partition column is dropped —
    *             folded rows become base rows)
    * @param subPartition sub-partition columns WITHIN each segment (e.g.
    *             [[SemanticIndex]]'s `cell=` dirs) — columns listed here
    *             must also appear in `cols`, and the folded base is
    *             rewritten with the same sub-layout so directory pruning
    *             keeps working after the fold
    * @return the segment values actually folded (missing ones are
    *         skipped; never includes `baseVal`)
    */
  def compact(spark: SparkSession, tableDir: String, partCol: String,
              baseVal: String, folds: Seq[String], cols: Seq[String],
              subPartition: Seq[String] = Nil): Seq[String] = {
    val dir = new File(tableDir)
    val present = Option(dir.listFiles).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map(_.getName.stripPrefix(s"$partCol="))
      .toSet
    val toFold = folds.distinct.filter(s => s != baseVal && present.contains(s))
    if (toFold.isEmpty) return Nil

    val live = (if (present.contains(baseVal)) baseVal +: toFold else toFold)
    val merged = spark.read.parquet(tableDir)
      .where(col(partCol).isin(live.map(x => x: Any): _*))
      .select(cols.map(col): _*)
    val staging = new File(dir.getParentFile, s".compact-${dir.getName}")
    deleteRecursively(staging)
    val writer =
      if (subPartition.isEmpty) merged.write
      // cluster by the sub-partition columns first: an unclustered
      // partitionBy write emits tasks × values files (see the
      // SemanticIndex.append comment) — the fold exists to SHRINK file
      // counts, so its own write must be one file per value
      else merged.repartition(subPartition.map(col): _*)
        .write.partitionBy(subPartition: _*)
    writer.mode("overwrite").parquet(staging.toString)

    live.foreach(s => deleteRecursively(new File(dir, s"$partCol=$s")))
    Files.move(staging.toPath, new File(dir, s"$partCol=$baseVal").toPath)
    refreshParent(spark, tableDir)
    toFold
  }

  /** Invalidate any cached file listing of `dir` — REQUIRED after an
    * overwrite (or filesystem move) of a SUBDIRECTORY root (`seg=<s>`,
    * `pb=<p>`): Spark's post-insert refresh covers only the written
    * subpath, while readers scan the PARENT, so a replayed-segment
    * rewrite otherwise leaves the session's FileStatusCache pointing at
    * deleted files (FAILED_READ_FILE.FILE_NOT_EXIST — the intermittent
    * RoundTripPropertySpec failure that exposed this for the store's
    * per-pb fan-out; the index appends share the hazard on replay).
    */
  def refreshParent(spark: SparkSession, dir: String): Unit =
    spark.catalog.refreshByPath(dir)

  /** Batch ids with a commit file in a structured-streaming checkpoint —
    * the set that can never be replayed (foreachBatch re-runs only the
    * batch whose offsets were logged but whose commit was not).
    */
  def committedBatches(checkpoint: String): Seq[Long] =
    Option(new File(checkpoint, "commits").listFiles).getOrElse(Array.empty[File])
      .map(_.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .sorted
      .toSeq

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Parse an index's `_params` key=value file — the ONE parser every
    * persisted-index `load` shares (there were six identical copies;
    * a new index type gets this right for free).
    */
  def readParams(path: String): Map[String, String] =
    new String(Files.readAllBytes(java.nio.file.Paths.get(path, "_params")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(a, b) = l.split("=", 2); (a.trim, b.trim) }
      .toMap
}
