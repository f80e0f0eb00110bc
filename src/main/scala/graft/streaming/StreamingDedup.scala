package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ext.{Dedup, MinHashIndex}

/** Streaming corpus construction: continuous near-dup filtering of a
  * document stream against a persisted [[MinHashIndex]] — the shape a
  * training-data pipeline actually runs: deliveries arrive continuously,
  * and a document is kept only if it near-dups neither the kept corpus
  * nor an earlier keeper in its own batch.
  *
  * Per micro-batch (the rule, deterministic given batch content):
  *
  *   1. cross dedup against the index ([[MinHashIndex.dedupBatch]]):
  *      any doc with an indexed near-dup is dropped (`dup_index`,
  *      dup_of = its smallest-id indexed match);
  *   2. within the remainder, exact-verified MinHash pairs →
  *      connected components → keep each cluster's min id
  *      (`dup_batch`, dup_of = cluster root) — the
  *      [[graft.ext.Curation.curateNearDups]] keeper rule. Components
  *      run on the REMAINDER: a doc whose only near-dup was itself
  *      dropped in step 1 survives (Jaccard is not transitive — it
  *      dups nothing that was kept);
  *   3. survivors are appended to the index as segment `b<batchId>` and
  *      verdicts land in `verdictPath/batch=<batchId>/` — BOTH
  *      overwrite-by-segment, so a replayed batch (foreachBatch is
  *      at-least-once) rewrites its own directories instead of
  *      double-appending: index maintenance is exactly-once.
  *
  * State lives entirely in the index parquet — no streaming state store,
  * so restarts resume from the checkpoint with nothing to rebuild and
  * the per-batch cost is bounded by |batch| × collided buckets, never
  * corpus size.
  */
object StreamingDedup {

  /** Start the filter on a streaming `docs` frame with (doc_id: long,
    * text: string) columns. The index at `indexPath` must already exist
    * ([[MinHashIndex.build]] over a non-empty seed corpus).
    *
    * @param compactEvery fold appended index segments into base every
    *        this many batches ([[MinHashIndex.compactCommitted]] —
    *        only segments strictly older than the checkpoint's newest
    *        commit, so replay safety is preserved). 0 disables; without
    *        it a long-lived stream accretes one segment directory per
    *        micro-batch per table and listing cost grows with stream
    *        AGE (tools/DedupSoak measures both regimes). The fold runs
    *        inside foreachBatch, i.e. quiesced: no concurrent reader of
    *        the index exists between batches.
    */
  def start(docs: DataFrame, indexPath: String, verdictPath: String,
            checkpoint: String, tau: Double = 0.5,
            compactEvery: Int = 0,
            prioCol: Option[String] = None): StreamingQuery =
    docs
      .select(col("doc_id") +: col("text") +: prioCol.map(col).toSeq: _*)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(batch, batchId, indexPath, verdictPath, tau, prioCol)
          // runs AFTER the batch's own append: its segment is the
          // newest and never in compactCommitted's fold set (the
          // checkpoint hasn't committed this batch yet)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            MinHashIndex.load(batch.sparkSession, indexPath)
              .compactCommitted(checkpoint): Unit
        }
      }
      .start()

  /** One batch of the rule above — public so a batch backfill can apply
    * the IDENTICAL keeper semantics outside a stream (segment and
    * verdict directory names come from `batchId` either way).
    *
    * ==Priority keepers (`prioCol`)==
    *
    * With `prioCol = Some(c)` (the index must have been built with
    * priorities — [[MinHashIndex.build]] `prioCol`), the min-id keeper
    * convention upgrades to the (priority, id) election of
    * [[Dedup.exactGroupsPriority]] / [[Dedup.clusterKeepersPriority]]
    * — lower priority value wins, id breaks ties, NULL loses:
    *
    *   - IN-BATCH (step 2): each component's keeper is its
    *     (priority, id)-minimum member — d74's batch-face semantics
    *     verbatim, so a crawl page and its curated twin arriving in one
    *     delivery resolve to the curated copy regardless of id order.
    *   - CROSS (step 1), where exactly-once bends the batch-global
    *     rule: an INDEXED survivor stays keeper against an incoming
    *     clone of equal-or-lower priority (the clone drops,
    *     `dup_of` = the (priority, id)-minimum indexed match); an
    *     incoming clone STRICTLY more trusted than every indexed match
    *     survives, is appended, and is thereby the keeper for its
    *     batch FORWARD — the already-indexed copy is NOT retracted (no
    *     index rewrite, no emitted-verdict rewrite). This departs from
    *     the batch-global election (which would drop the indexed copy)
    *     deliberately: retracting would rewrite committed segments and
    *     verdict directories, breaking replay idempotence; downstream
    *     consumers see the trusted copy as keeper from its batch on,
    *     and future clones of either copy resolve to it via the same
    *     (priority, id)-min election.
    *
    * Scale shape: the election adds one equi-join of the batch's
    * candidate pairs against the index's (id, prio) table — the same
    * cost class as the band join (corpus-side scan, batch-side
    * broadcast, nothing quadratic) — and the in-batch election is
    * [[Dedup.clusterKeepersPriority]]'s map-side `min_by` partial
    * aggregate. Replays exclude the batch's own prio segment like
    * every other table, so the election's inputs predate the batch's
    * append and verdicts reproduce exactly.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   verdictPath: String, tau: Double,
                   prioCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val idx = MinHashIndex.load(spark, indexPath)
    prioCol.foreach(_ => require(idx.hasPriorities,
      s"prioCol is set but the index at $indexPath was built without " +
        "priorities (MinHashIndex.build prioCol)"))
    val docs = batch
      .select(col("doc_id") +: col("text") +: prioCol.map(col).toSeq: _*)
      .cache()
    try {
      // The batch is shingled and signed ONCE, and ONE fused
      // candidates-union pass ([[MinHashIndex.nearPairsUnion]], r15)
      // yields both verdict classes' pairs — previously the cross check
      // re-shingled the batch inside dedupBatch, the in-batch search
      // re-shingled the remainder, and the append re-shingled the
      // survivors: three shingle passes and two full verify chains over
      // one delivery. Shingling is per-document, so filtering the
      // cached tables per stage is exact.
      val docSh = Dedup.hashShingles(Dedup.shingles(docs, idx.n)).cache()
      val docSigs = idx.signaturesOf(docSh).cache()
      def idsOf(d: DataFrame)(t: DataFrame): DataFrame =
        t.join(d.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      val nearPairs = idx.nearPairsUnion(docs, tau,
        excludeSeg = Some(s"b$batchId"),
        shingled = Some(docSh), signatures = Some(docSigs)).cache()
      // 1. cross: smallest indexed match per dropped doc (the
      // (priority, id)-minimum match under the election). The batch's
      // own segment is excluded so a replay (at-least-once foreachBatch)
      // reads the index as it stood BEFORE its first attempt's append —
      // without this, replayed survivors match their own earlier rows
      // and the rewrite empties the segment.
      val rawCross = nearPairs.where(col("cross"))
        .select(col("a").as("doc_id"), col("b").as("dup_of"), col("jaccard"))
      val cross = (prioCol match {
        case Some(pc) =>
          // drop iff some indexed match is at least as trusted; the
          // strictly-more-trusted clone falls through to survive
          // (Dedup.electCrossKeepers — the faces' shared election)
          Dedup.electCrossKeepers(rawCross, docs, pc,
            idx.priorities(excludeSeg = Some(s"b$batchId")))
        case None =>
          rawCross.groupBy("doc_id").agg(min(col("dup_of")).as("dup_of"))
      }).cache()
      val remaining = docs.join(cross.select("doc_id"), Seq("doc_id"), "left_anti")

      // 2. in-batch: exact-verified pairs → components → keep the
      // min id (or the (priority, id)-minimum member under prioCol).
      // The pair set is the fused pass's in-batch rows with both
      // endpoints filtered into the remainder — banding/estimate/
      // Jaccard are per-pair functions, so this equals
      // minhashDuplicates(remaining) row-for-row.
      val pairs = nearPairs.where(!col("cross"))
        .join(remaining.select(col("doc_id").as("a")), Seq("a"), "left_semi")
        .join(remaining.select(col("doc_id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"), col("jaccard"))
      val batchDups = (prioCol match {
        case Some(pc) =>
          Dedup.clusterKeepersPriority(pairs, remaining,
              idCol = "doc_id", prioCol = pc)
            .where(col("id") =!= col("keeper"))
            .select(col("id").as("doc_id"), col("keeper").as("dup_of"))
        case None =>
          Dedup.connectedComponents(pairs)
            .where(col("id") =!= col("root"))
            .select(col("id").as("doc_id"), col("root").as("dup_of"))
      }).cache()
      val survivors = remaining
        .join(batchDups.select("doc_id"), Seq("doc_id"), "left_anti")
        .cache()

      // 3. exactly-once effects: segment + verdict dirs keyed by
      // batchId — the VERDICT first: append's refreshByPath invalidates
      // `cross`'s cache (its plan reads the index tables), so a verdict
      // write after the append would silently recompute the cross-dedup
      // chain (the StreamingCorpusPipeline finding); both effects are
      // overwrite-keyed, so the order is immaterial to replay.
      cross.withColumn("verdict", lit("dup_index"))
        .unionByName(batchDups.withColumn("verdict", lit("dup_batch")))
        .unionByName(survivors.select(col("doc_id"),
          lit(null).cast("long").as("dup_of"), lit("kept").as("verdict")))
        .select("doc_id", "verdict", "dup_of")
        .write.mode("overwrite").parquet(s"$verdictPath/batch=$batchId")
      idx.append(survivors, seg = s"b$batchId",
        shingled = Some(idsOf(survivors)(docSh)),
        signatures = Some(idsOf(survivors)(docSigs)),
        prioCol = prioCol)
      // teardown most-derived-first: non-cascading unpersist EAGERLY
      // rebuilds any live cache whose plan references the dropped one
      // — dropping `cross` before its dependents would re-run their
      // chains just to throw them away
      survivors.unpersist(blocking = true)
      batchDups.unpersist(blocking = true)
      cross.unpersist(blocking = true)
      nearPairs.unpersist(blocking = true)
      docSigs.unpersist(blocking = true)
      docSh.unpersist(blocking = true)
    } finally docs.unpersist(blocking = true)
  }
}
