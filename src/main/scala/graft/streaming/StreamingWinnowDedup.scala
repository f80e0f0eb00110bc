package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ext.{Dedup, WinnowIndex}

/** Streaming winnow-fingerprint dedup: the [[StreamingDedup]] rule on
  * the positional sub-token signal — a document is kept only if its
  * winnow-hash containment reaches tau against neither the kept corpus
  * (persisted [[WinnowIndex]]) nor an earlier keeper in its own batch.
  * Catches the cross-delivery near-dups that share long char runs but
  * tokenize differently (the d54 argument), continuously.
  *
  * Per micro-batch: cross verdicts via [[WinnowIndex.dedupBatch]] with
  * the batch's OWN segment excluded (replay-idempotent reads); in-batch
  * keepers via [[Dedup.winnowPairs]] → connected components → min-id;
  * survivors appended as segment `b<batchId>` and verdicts written to
  * `verdictPath/batch=<batchId>/` — both overwrite-by-directory, so
  * index maintenance and output are exactly-once under at-least-once
  * foreachBatch. State is the index parquet only.
  */
object StreamingWinnowDedup {

  /** Start the filter on a streaming (doc_id: long, text: string)
    * frame. The index at `indexPath` must already exist
    * ([[WinnowIndex.build]]).
    *
    * @param compactEvery fold appended segments into base every this
    *        many batches ([[WinnowIndex.compactCommitted]] — only
    *        segments strictly older than the newest commit). 0 disables.
    */
  def start(docs: DataFrame, indexPath: String, verdictPath: String,
            checkpoint: String, tau: Double = 0.5,
            maxHashFreq: Long = 64, compactEvery: Int = 0,
            prioCol: Option[String] = None): StreamingQuery =
    docs
      .select(col("doc_id") +: col("text") +: prioCol.map(col).toSeq: _*)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, indexPath, verdictPath, tau,
            maxHashFreq, prioCol)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            WinnowIndex.load(batch.sparkSession, indexPath)
              .compactCommitted(checkpoint): Unit
        }
      }
      .start()

  /** One batch of the rule — public so a batch backfill can apply the
    * IDENTICAL keeper semantics outside a stream.
    *
    * `prioCol` upgrades both keeper rules to the (priority, id)
    * election — [[StreamingDedup.processBatch]]'s semantics verbatim
    * (indexed survivor stays keeper against equal-or-lower priority; a
    * strictly more trusted late clone is kept and becomes keeper for
    * its batch forward, no index rewrite; in-batch components elect
    * the (priority, id)-minimum via [[Dedup.clusterKeepersPriority]]).
    * The index must carry priorities ([[WinnowIndex.build]] `prioCol`).
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   verdictPath: String, tau: Double,
                   maxHashFreq: Long = 64,
                   prioCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val idx = WinnowIndex.load(spark, indexPath)
    prioCol.foreach(_ => require(idx.hasPriorities,
      s"prioCol is set but the index at $indexPath was built without " +
        "priorities (WinnowIndex.build prioCol)"))
    val docs = batch
      .select(col("doc_id") +: col("text") +: prioCol.map(col).toSeq: _*)
      .cache()
    try {
      val rawCross = idx.dedupBatch(docs, tau, maxHashFreq,
        excludeSeg = Some(s"b$batchId"))
      val cross = (prioCol match {
        case Some(pc) =>
          Dedup.electCrossKeepers(rawCross, docs, pc,
            idx.priorities(excludeSeg = Some(s"b$batchId")))
        case None =>
          rawCross.groupBy("doc_id").agg(min(col("dup_of")).as("dup_of"))
      }).cache()
      val remaining = docs.join(cross.select("doc_id"), Seq("doc_id"), "left_anti")
      val pairs = Dedup.winnowPairs(remaining, k = idx.k, w = idx.w,
        tau = tau, maxHashFreq = maxHashFreq)
      val batchDups = (prioCol match {
        case Some(pc) =>
          Dedup.clusterKeepersPriority(pairs.select("a", "b"), remaining,
              idCol = "doc_id", prioCol = pc)
            .where(col("id") =!= col("keeper"))
            .select(col("id").as("doc_id"), col("keeper").as("dup_of"))
        case None =>
          Dedup.connectedComponents(pairs.select("a", "b"))
            .where(col("id") =!= col("root"))
            .select(col("id").as("doc_id"), col("root").as("dup_of"))
      }).cache()
      val survivors = remaining
        .join(batchDups.select("doc_id"), Seq("doc_id"), "left_anti")
        .cache()
      // verdict BEFORE append (append's refreshByPath invalidates
      // `cross`'s cache, whose plan reads the index; a later verdict
      // write would recompute it); teardown most-derived-first
      // (non-cascading unpersist eagerly rebuilds live dependents)
      cross.withColumn("verdict", lit("dup_index"))
        .unionByName(batchDups.withColumn("verdict", lit("dup_batch")))
        .unionByName(survivors.select(col("doc_id"),
          lit(null).cast("long").as("dup_of"), lit("kept").as("verdict")))
        .select("doc_id", "verdict", "dup_of")
        .write.mode("overwrite").parquet(s"$verdictPath/batch=$batchId")
      idx.append(survivors, seg = s"b$batchId", prioCol = prioCol)
      survivors.unpersist(blocking = true)
      batchDups.unpersist(blocking = true)
      cross.unpersist(blocking = true)
    } finally docs.unpersist(blocking = true): Unit
  }
}
