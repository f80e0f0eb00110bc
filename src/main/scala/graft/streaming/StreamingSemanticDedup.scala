package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ext.{SemanticIndex, Similarity}

/** Streaming semantic corpus construction: continuous SemDeDup-style
  * filtering of an embedding stream against a persisted
  * [[SemanticIndex]] — the embedding twin of [[StreamingDedup]],
  * completing the {batch, incremental} × {text MinHash, embedding
  * SemDeDup} matrix. A vector is kept only if it semantically
  * duplicates neither the kept corpus nor an earlier keeper in its own
  * batch.
  *
  * Per micro-batch (deterministic given batch content):
  *
  *   1. cross dedup against the index ([[SemanticIndex.dedupBatch]]):
  *      any vector with an indexed cell-mate at cosine >= tau is
  *      dropped (`dup_index`, dup_of = its smallest-id indexed match);
  *   2. within the remainder, the [[graft.ext.Dedup.semanticDedup]]
  *      keeper rule: drop any vector with a SMALLER-id remainder
  *      cell-mate at cosine >= tau (`dup_batch`). Applied to the
  *      REMAINDER, not the raw batch: a vector whose only near-dup was
  *      itself dropped in step 1 still has that indexed dup — cosine
  *      chains are not transitive, but step 1 already dropped it, so
  *      the remainder rule only adjudicates among potential keepers;
  *   3. survivors are appended as segment `b<batchId>` and verdicts
  *      land in `verdictPath/batch=<batchId>/` — both
  *      overwrite-by-segment, so an at-least-once foreachBatch replay
  *      rewrites its own directories: index maintenance is
  *      exactly-once ([[StreamingDedup]] contract; the replay excludes
  *      its own segment when re-reading the index).
  *
  * State lives entirely in the index parquet — no streaming state
  * store. Per-batch cost is |batch| × avg cell size (cell-directory
  * pruning on the member scan), never corpus size, provided nlist was
  * scaled to the corpus at build time.
  */
object StreamingSemanticDedup {

  /** Start the filter on a streaming frame with (vec_id: long,
    * embedding: array&lt;float&gt;) columns. The index at `indexPath`
    * must already exist ([[SemanticIndex.build]] over a non-empty seed
    * corpus).
    *
    * @param compactEvery fold appended index segments into base every
    *        this many batches ([[SemanticIndex.compactCommitted]] —
    *        replay-safe boundary). 0 disables; without it a long-lived
    *        stream accretes one segment directory per micro-batch and
    *        listing cost grows with stream age.
    */
  def start(emb: DataFrame, indexPath: String, verdictPath: String,
            checkpoint: String, tau: Double = 0.35,
            compactEvery: Int = 0): StreamingQuery =
    emb
      .select(col("vec_id"), col("embedding"))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, indexPath, verdictPath, tau)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            SemanticIndex.load(batch.sparkSession, indexPath)
              .compactCommitted(checkpoint): Unit
        }
      }
      .start()

  /** One batch of the rule above — public so a batch backfill can apply
    * the IDENTICAL keeper semantics outside a stream.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   verdictPath: String, tau: Double): Unit = {
    val spark = batch.sparkSession
    val idx = SemanticIndex.load(spark, indexPath)
    // Same vec_id delivered twice inside one batch collapses to one row
    // up front: the in-batch rule's strict x.id < y.id can never pair an
    // id with itself, so without this a re-delivered id would append
    // twice and write two verdicts. A payload tie is broken arbitrarily
    // — only observable when one id carries two DIFFERENT vectors in one
    // delivery, which is an upstream key-assignment bug.
    val vecs = batch.select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
    // ONE centroid assignment per micro-batch, threaded through cross
    // dedup, the in-batch rule, and the append (each used to re-assign:
    // three normalize + broadcast-score passes per batch on the hot path)
    val assigned = idx.assign(vecs).cache()
    try {
      // 1. cross: smallest indexed match per dropped vector; own-segment
      // exclusion so a replay reads the index as of its FIRST attempt
      val cross = idx.dedupAssigned(assigned, tau, excludeSeg = Some(s"b$batchId"))
        .groupBy("vec_id").agg(min(col("dup_of")).as("dup_of"))
        .cache()
      val remaining = assigned.join(
        cross.select(col("vec_id").as("id")), Seq("id"), "left_anti")

      // 2. in-batch: the semanticDedup smaller-id keeper rule within the
      // remainder's cells (the index's frozen centroid space, so batch
      // and index agree on cells)
      val sim = Similarity.pairSim(idx.normalized, col("x.vec"), col("y.vec"))
      val batchDups = remaining.as("x")
        .join(remaining.as("y"),
          col("x.cell") === col("y.cell") && col("x.id") < col("y.id"))
        .where(sim >= tau)
        .groupBy(col("y.id").as("vec_id"))
        .agg(min(col("x.id")).as("dup_of"))
        .cache()
      val survivors = remaining
        .join(batchDups.select(col("vec_id").as("id")), Seq("id"), "left_anti")
        .cache()

      // 3. exactly-once effects: segment + verdict dirs keyed by
      // batchId — verdict BEFORE append (append's refreshByPath
      // invalidates `cross`'s cache, whose plan reads the index; a
      // later verdict write would recompute it), teardown
      // most-derived-first (non-cascading unpersist eagerly rebuilds
      // live dependents of the dropped entry)
      cross.withColumn("verdict", lit("dup_index"))
        .unionByName(batchDups.withColumn("verdict", lit("dup_batch")))
        .unionByName(survivors.select(col("id").as("vec_id"),
          lit(null).cast("long").as("dup_of"), lit("kept").as("verdict")))
        .select("vec_id", "verdict", "dup_of")
        .write.mode("overwrite").parquet(s"$verdictPath/batch=$batchId")
      idx.appendAssigned(survivors, seg = s"b$batchId")
      survivors.unpersist(blocking = true)
      batchDups.unpersist(blocking = true)
      cross.unpersist(blocking = true)
    } finally { assigned.unpersist(blocking = true); () }
  }
}
