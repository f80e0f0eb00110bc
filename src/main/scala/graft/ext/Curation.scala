package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and packing: benchmark decontamination and
  * deterministic per-source capping. Scale-first designs:
  *
  *   - decontamination joins the CORPUS against the (small) benchmark
  *     n-gram index, broadcast — the 100 TB side streams through one
  *     stage, never shuffles on text;
  *   - capping is one shuffle by source; order keys are content hashes,
  *     so reruns and engine ports pick identical samples (no RNG state).
  */
object Curation {

  /** Benchmark-contamination report: training documents sharing ≥1 word
    * n-gram with any benchmark/eval document (the GPT-3-style n-gram
    * decontamination test). Returns one row per contaminated training
    * doc: (doc_id, hits = distinct contaminated n-grams,
    * contaminated_by = smallest benchmark doc id sharing one).
    *
    * The benchmark index (distinct shingle → min bench id) is tiny
    * relative to any training corpus — broadcast it so the corpus-side
    * shingle stream never shuffles; contamination then costs one scan +
    * one aggregation by doc.
    */
  def contamination(train: DataFrame, bench: DataFrame, n: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text",
                    trainShingles: Option[DataFrame] = None,
                    benchShingles: Option[DataFrame] = None): DataFrame = {
    // pre-shingled HASHED (id, h) inputs (Dedup.hashShingles) let a
    // session running several n-gram operators share one memoized shingle
    // dictionary (shingling is per-document, so filtered-docs shingles ==
    // filtered shingles); the index join moves 8-byte keys, not n-grams
    val benchIdx = benchShingles
      .getOrElse(Dedup.hashShingles(Dedup.shingles(bench, n, idCol, textCol)))
      .groupBy("h")
      .agg(min("id").as("bmin"))
    trainShingles
      .getOrElse(Dedup.hashShingles(Dedup.shingles(train, n, idCol, textCol)))
      .join(broadcast(benchIdx), "h")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("hits"), min("bmin").as("contaminated_by"))
      .select(col(idCol), col("hits"), col("contaminated_by"))
  }

  /** Deterministic per-source cap: keep at most `k` documents per source,
    * chosen by a stable content-hash order (md5 of the id — portable
    * across engines and reruns, unlike RNG sampling). Returns the kept
    * rows with their sample rank.
    *
    * The rank is a running COUNT in hash order, i.e. [[prefixSums]] over
    * a constant 1 — so a pathologically hot source shards across range
    * partitions like the packing family instead of pulling its whole
    * stream through one `row_number` reducer (the same Zipfian-source
    * fix as packChunks/tokenBudgetSelect, and still exact: shard-local
    * rank + broadcast shard offsets ≡ the global row_number).
    */
  def capPerSource(docs: DataFrame, k: Int,
                   idCol: String = "doc_id", srcCol: String = "source"): DataFrame = {
    val rows = docs.select(col(idCol), col(srcCol),
      md5(col(idCol).cast("string")).as("__ord"), lit(1L).as("__one"))
    prefixSums(rows, srcCol, "__one", Seq(col("__ord"), col(idCol)))
      .where(col("cum") <= k)
      .select(col(idCol), col(srcCol), col("cum").cast("int").as("rk"))
  }

  /** Global deterministic training order: a portable content-hash sort
    * key per document — reruns, resumed jobs, and engine ports all
    * produce the SAME shuffle for the same seed, with no RNG state to
    * checkpoint. Consumers `.orderBy("okey")`: Spark plans that as a
    * RANGE-partitioned global sort (sampled boundaries, per-partition
    * sort), never a single-reducer `row_number` — the only shape that
    * survives a 100 TB corpus.
    */
  def shuffleOrder(docs: DataFrame, seed: Long,
                   idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("okey"))
      .orderBy("okey")

  /** Token-balanced shard assignment for training export — the
    * WebDataset/tf.data pattern: a FIXED shard count, a deterministic
    * global order, every document whole inside exactly one shard.
    * Order = the md5 hash shuffle ([[shuffleOrder]]'s key); the running
    * token sum is the two-phase [[prefixSums]] scan under a constant
    * grouping key, so the whole corpus (one giant "source") never
    * serializes through a single task. Shard boundaries sit at
    * total·i/n: shard = ⌊startOffset · n / total⌋ (exact integer
    * division, safe to 2⁵³/n tokens), which balances shard token masses
    * to within one document of each other.
    *
    * @return (doc_id, toks, ord, shard)
    */
  def shardAssign(docs: DataFrame, nShards: Int, seed: Long = 42L,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val rows = docs.select(col(idCol).as("doc_id"),
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("ord"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"))
      .withColumn("__g", lit(0))
    // one driver scalar (the corpus token total) — bounded, like the
    // union-find edge count
    val total = math.max(
      Option(rows.agg(sum("toks")).first().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L), 1L)
    prefixSums(rows, "__g", "toks", Seq(col("ord"), col("doc_id")))
      .withColumn("shard",
        least(expr(s"((cum - toks) * $nShards) div $total"),
          lit(nShards - 1L)).cast("int"))
      .select(col("doc_id"), col("toks"), col("ord"), col("shard"))
  }

  /** Per-shard manifest over a [[shardAssign]] frame: the record a
    * training loader consumes (shard → document and token masses).
    */
  def shardManifest(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"))

  /** Materialize the sharded corpus: assign, CLUSTER BY shard (hash
    * repartition on the partition column — one parquet file per shard,
    * never tasks × shards files), write `partitionBy("shard")`, return
    * the manifest. Readers get shard-pruned scans for free.
    */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
                  seed: Long = 42L, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val assigned = shardAssign(docs, nShards, seed, idCol, textCol)
    docs.join(assigned.select(col("doc_id").as(idCol), col("shard")), idCol)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shardManifest(assigned)
  }

  /** Deterministic stratified sampling: keep each stratum (language,
    * source, …) at its own target fraction by hashing the document id
    * onto the unit interval — `md5(id)`'s first 8 hex digits sort below
    * the stratum's threshold iff the doc falls in its kept fraction.
    * Portable (md5 hex compares identically everywhere) and stable:
    * adding documents never flips earlier keep decisions, so incremental
    * corpus builds stay consistent. Strata without a configured fraction
    * are dropped. One broadcast join; no shuffle of the corpus.
    */
  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
                       stratumCol: String = "lang",
                       idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def thresh(f: Double): String =
      if (f >= 1.0) "g" // sorts above every hex digit — keep all
      else "%08x".format( // clamp: f within 2^-33 of 1.0 rounds to 2^32,
        // which would format as NINE hex chars and break the compare
        math.min(4294967295L, math.max(0L, math.round(f * 4294967296.0))))
    val frDf = fractions.toSeq.map { case (k, f) => (k, thresh(f)) }
      .toDF(stratumCol, "h_thresh")
    docs
      .join(broadcast(frDf), stratumCol)
      .where(substring(md5(col(idCol).cast("string")), 1, 8) < col("h_thresh"))
      .select(col(idCol), col(stratumCol))
  }

  /** Per-stage attrition report for a quality-filter chain: how many
    * documents enter each stage and how many survive it, with stages
    * applied in order (a doc dropped at stage i is not counted against
    * later stages — the numbers a pipeline owner actually wants when a
    * corpus shrinks unexpectedly). One scan: each doc's pass DEPTH
    * (leading stages passed) aggregates into conditional counts; the
    * per-stage rows come from `stack`, never a driver loop.
    */
  def qualityAttrition(docs: DataFrame,
                       stages: Seq[(String, Column)]): DataFrame = {
    // a NULL predicate (null text through langId/qualityScore) FAILS its
    // stage, matching what `.where(pred)` would drop — without the
    // coalesce a null would fall through every when() and count as
    // surviving the whole chain
    val depth = stages.zipWithIndex.foldRight(lit(stages.size)) {
      case (((_, pred), i), otherwise) =>
        when(!coalesce(pred, lit(false)), lit(i)).otherwise(otherwise)
    }
    val aggCols = count(lit(1)).as("c0") +:
      stages.indices.map(i =>
        sum(when(col("d") >= i + 1, 1L).otherwise(0L)).as(s"c${i + 1}"))
    val counts = docs
      .select(depth.as("d"))
      .agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = stages.zipWithIndex
      .map { case ((name, _), i) =>
        // stage names land inside a SQL string literal — escape quotes so
        // a name like "it's short" can't terminate the literal
        s"'${name.replace("'", "''")}', ${i + 1}, c$i, c${i + 1}" }
      .mkString(", ")
    counts.selectExpr(
      s"stack(${stages.size}, $stackArgs) AS (stage, stage_idx, docs_in, docs_kept)")
      .select(col("stage"), col("stage_idx").cast("int").as("stage_idx"),
        col("docs_in"), col("docs_kept"),
        (col("docs_in") - col("docs_kept")).as("docs_dropped"))
  }

  /** Distributed ROWS-frame prefix sum: `cum` = running total of
    * `valCol` within `srcCol` ordered by `orderCols`, computed WITHOUT
    * ever streaming one source's whole corpus through a single task —
    * the two-phase scan a `Window.partitionBy(source)` running sum needs
    * at 100 TB, where source skew is the rule (one crawl IS most of a
    * real corpus) and a per-source window serializes terabytes on one
    * core.
    *
    * Phase 1: range-partition rows by (source, order key) — contiguous
    * order-key shards, sampled boundaries, so a dominant source spreads
    * over ~all shards. Per-shard totals are one small aggregate (≤
    * `spark.sql.shuffle.partitions` rows). Phase 2: each shard's
    * EXCLUSIVE prefix offset (a window over the tiny totals frame) is
    * broadcast back and added to a shard-local running sum. Net cost:
    * two shuffles of the data (range + the shard-local window's hash
    * exchange) and one broadcast — no task ever holds more than
    * ~1/shards of the data, whatever the skew.
    *
    * The shard assignment is PHYSICAL (sampled range boundaries + the
    * nondeterministic `spark_partition_id`), and the offsets pass and
    * the cum pass below both read it — so they MUST read one
    * materialization. Left lazy, the planner is free to compile the
    * exchange separately under each pass, `repartitionByRange`
    * RESAMPLES its boundaries, and the offsets are computed against a
    * different shard assignment than the local sums: ranks silently
    * stop being a permutation. Invisible at fixture scale (stable
    * boundaries), caught at 2M rows by `tools/PrefixSumCheck` —
    * Σ copies drifted ±0.5% run-over-run with duplicate/missing ranks.
    * The lazy `localCheckpoint` pins one shared materialization without
    * forcing a job at plan-construction time (the Bpe trainer's
    * checkpoint discipline); the frame is the caller's pre-projected
    * narrow columns, not document text. On a cluster, executor loss
    * recomputes the whole frame from the checkpoint's truncated lineage
    * (rerun, not corruption) — `checkpoint()` to reliable storage is
    * the belt-and-braces production variant.
    *
    * Returns the input columns + `cum` + the `__shard` id (callers drop
    * it; tests assert skewed sources actually span shards).
    */
  private[ext] def prefixSums(rows: DataFrame, srcCol: String, valCol: String,
                              orderCols: Seq[Column]): DataFrame = {
    val shards = rows.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = rows
      .repartitionByRange(shards, (col(srcCol) +: orderCols): _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint(false)
    val wo = Window.partitionBy(col("__src")).orderBy(col("__oshard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col(srcCol).as("__src"), col("__shard").as("__oshard"))
      .agg(sum(col(valCol)).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wo), lit(0L)))
      .select(col("__src"), col("__oshard"), col("__off"))
    val w = Window.partitionBy(col(srcCol), col("__shard"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__cumLocal", sum(col(valCol)).over(w))
      .join(broadcast(offsets),
        col(srcCol) === col("__src") && col("__shard") === col("__oshard"))
      .withColumn("cum", col("__cumLocal") + col("__off"))
      .drop("__src", "__oshard", "__off", "__cumLocal")
  }

  /** CCNet-style score-tier bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359: rank by LM score per source, keep the best
    * tiers): each source's documents are ranked by `scoreCol` (ties
    * broken by `idCol`) and split into `buckets` equal-frequency tiers,
    * tier 1 = best. Compose with [[TextAnalysis.unigramNll]] (lower =
    * better, the default ascending order) or any score column.
    *
    * Tier arithmetic is floor((rank − 1) · buckets / n) + 1 — spelled
    * identically in the oracles rather than SQL NTILE, whose remainder
    * distribution (front-loaded) differs from this even-spread form.
    *
    * Scale shape: the rank is [[prefixSums]] over a constant 1 — the
    * two-phase scan — so a dominant source never serializes through one
    * task (the packing family's discipline); per-source sizes are a
    * broadcast-joined aggregate (one row per source).
    *
    * @return (source, doc_id, score, tier)
    */
  def bucketByScore(scored: DataFrame, buckets: Int = 3,
                    scoreCol: String = "score", ascending: Boolean = true,
                    idCol: String = "doc_id",
                    srcCol: String = "source"): DataFrame = {
    val base = scored.select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        col(scoreCol).cast("double").as("score"))
      .withColumn("one", lit(1L))
    val order =
      if (ascending) Seq(col("score"), col("doc_id"))
      else Seq(col("score").desc, col("doc_id"))
    val sizes = base.groupBy("source").agg(count(lit(1)).as("n"))
    prefixSums(base, "source", "one", order)
      .join(broadcast(sizes), "source")
      .select(col("source"), col("doc_id"), col("score"),
        (floor((col("cum") - 1L) * buckets / col("n")) + 1L)
          .cast("int").as("tier"))
  }

  /** [[bucketByScore]]'s one-pass 100 TB shape (the d70/t32 approx-twin
    * pattern): tier thresholds come from `percentile_approx` — a
    * constant-size quantile sketch that partial-aggregates map-side —
    * instead of the exact two-phase rank, so the whole assignment is
    * ONE aggregate keyed on source plus a broadcast threshold join
    * back. No range repartition of the corpus, no window: at 100 TB
    * the exact rank's range exchange is a full sort-shuffle of the
    * score column; this never shuffles the corpus at all.
    *
    * Semantic difference, deliberate: equal scores land in the SAME
    * tier (threshold comparison), where the exact rank splits a tie
    * group across a boundary by doc_id — calibration wants the stable
    * behavior. Tier populations are approximately equal (per-source
    * rank error ≤ n/accuracy). Null scores: callers filter them first,
    * [[bucketByScore]]'s contract (a null compares into tier 1 here).
    *
    * `thresholds` injects a pinned per-source boundary table
    * (source, __thr: array<double>, ascending-sorted) in place of the
    * `percentile_approx` sketch — the assignment arithmetic (broadcast
    * threshold join + tier count) is then a deterministic function of
    * the injected literals, which is what lets d72b hash-gate this
    * operator's downstream against DuckDB while the sketch itself
    * stays rows-only (the d69 pinned-coefficients move).
    *
    * @return (source, doc_id, score, tier) — tier 1 = best
    */
  def bucketByScoreApprox(scored: DataFrame, buckets: Int = 3,
                          scoreCol: String = "score", ascending: Boolean = true,
                          idCol: String = "doc_id", srcCol: String = "source",
                          accuracy: Int = 10000,
                          thresholds: Option[DataFrame] = None): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val base = scored.select(col(srcCol).as("source"), col(idCol).as("doc_id"),
      col(scoreCol).cast("double").as("score"))
    if (buckets == 1) return base.withColumn("tier", lit(1))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val thr = thresholds.getOrElse(base.groupBy("source")
      .agg(percentile_approx(col("score"), typedLit(probs), lit(accuracy))
        .as("__thr")))
    // tier = 1 + number of thresholds strictly on the better side of
    // this score; duplicate thresholds (a mass point spanning several
    // boundaries) skip the intermediate tiers, keeping the whole tie
    // group together
    base.join(broadcast(thr), "source")
      .withColumn("tier",
        aggregate(col("__thr"), lit(1), (acc, t) =>
          acc + when(if (ascending) col("score") > t else col("score") < t,
            1).otherwise(0)).cast("int"))
      .select(col("source"), col("doc_id"), col("score"), col("tier"))
  }

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * sampling rule of XLM-R and mT5 (Conneau et al. 2020,
    * arXiv:1911.02116 §5; Xue et al. 2021, arXiv:2010.11934 §3.1):
    * sample sources with probability p_s ∝ n_s^τ, flattening a Zipfian
    * source distribution toward uniform as τ → 0 (τ = 1 keeps natural
    * proportions) so dominant crawls stop drowning the tail. Each
    * source's quota out of `target` total documents is
    * least(n_s, floor(target · w_s)) with w_s = n_s^τ / Σ_t n_t^τ
    * ROUNDED to 9 decimals first — canonicalizing the only
    * engine-divergent floats (pow + an order-sensitive sum) before the
    * floor, so reruns and engine ports compute identical quotas. Within
    * a source the quota picks the smallest md5(id) hashes
    * ([[capPerSource]]'s key): deterministic, portable, and stable —
    * a doc's hash never changes, so growing the corpus only ever
    * slides the quota boundary.
    *
    * Scale shape: source stats are one map-side-combinable aggregate
    * (one row per source) and ride a broadcast join back; the
    * within-source rank is the two-phase [[prefixSums]] scan, so a
    * source holding most of the corpus spreads over ~all shards.
    * Sources whose scaled share floors to a zero quota drop out.
    *
    * @return (source, doc_id, rk, quota) — the kept rows with their
    *         hash-order rank and the source's quota
    */
  def temperatureSample(docs: DataFrame, tau: Double, target: Long,
                        idCol: String = "doc_id",
                        srcCol: String = "source"): DataFrame =
    tauRanked(docs, tau, target, idCol, srcCol)
      .select(col("source"), col("doc_id"), col("rk"),
        least(col("n"), col("rawQuota")).as("quota"))
      .where(col("rk") <= col("quota"))

  /** The τ-weighted quota/rank chain [[temperatureSample]] and
    * [[upsampleQuotas]] share — ONE definition point, because the
    * upsampling face's documented degradation guarantee ("a sub-size
    * quota degrades to temperatureSample's kept set — same order, same
    * boundary") requires the 9dp weight rounding, the md5 order key,
    * and the prefixSums rank to stay bit-identical between the two.
    *
    * @return (source, doc_id, rk, n, rawQuota) — rk the stable
    *         hash-order rank, rawQuota = floor(target · w) UNCLAMPED
    */
  private def tauRanked(docs: DataFrame, tau: Double, target: Long,
                        idCol: String, srcCol: String): DataFrame = {
    val sizes = docs.groupBy(col(srcCol).as("source")).agg(count(lit(1)).as("n"))
    val tot = sizes.agg(sum(pow(col("n"), lit(tau))).as("wsum"))
    val quotas = sizes.crossJoin(broadcast(tot))
      .withColumn("w", round(pow(col("n"), lit(tau)) / col("wsum"), 9))
      .select(col("source"), col("n"),
        floor(lit(target.toDouble) * col("w")).cast("long").as("rawQuota"))
    val rows = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      md5(col(idCol).cast("string")).as("__ord"), lit(1L).as("__one"))
    prefixSums(rows, "source", "__one", Seq(col("__ord"), col("doc_id")))
      // rk stays LONG: a source past 2^31 docs would wrap an int rank
      // negative and silently pass the quota filter at the 100 TB scale
      // this module targets
      .select(col("source"), col("doc_id"), col("cum").as("rk"))
      .join(broadcast(quotas), "source")
  }

  /** Quality-ordered selection under a per-source token budget: each
    * source keeps its best documents (quality desc, doc_id tie-break)
    * until the next one would exceed `budget` cumulative tokens — the
    * "fill the mixture bucket" step of corpus construction. The running
    * sum is the two-phase [[prefixSums]] scan, so a source holding most
    * of the corpus still spreads across shards; a GLOBAL budget is the
    * per-source result with source budgets set by the mixture weights.
    */
  def tokenBudgetSelect(docs: DataFrame, budget: Long,
                        idCol: String = "doc_id", srcCol: String = "source",
                        textCol: String = "text"): DataFrame = {
    val scored = docs
      .select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"),
        TextAnalysis.qualityScore(col(textCol)).as("q"))
    prefixSums(scored, "source", "toks", Seq(col("q").desc, col("doc_id")))
      .where(col("cum") <= budget)
      .select(col("source"), col("doc_id"), col("toks"), col("cum"))
  }

  /** Temperature mixing WITHOUT the natural-size clamp — the upsampling
    * face of [[temperatureSample]]: when a source's τ-scaled quota
    * exceeds its size, its documents REPEAT (the standard
    * "epochs over the tail" mixing recipe: curated sources like wiki
    * and books run several epochs per pass while the dominant crawl
    * runs less than one). Each doc's copy count is `quota div n` plus
    * one more for the first `quota mod n` docs in the stable md5-hash
    * order — Σ copies == quota EXACTLY per source, and growing the
    * corpus only slides the mod boundary. A source whose quota floors
    * at or under its size degrades to [[temperatureSample]]'s kept set
    * with copies = 1 (same order, same boundary — both faces read the
    * one [[tauRanked]] chain, so they cannot drift).
    *
    * Scale shape: identical to [[temperatureSample]]; the copy count is
    * a column computation (materializing the repeats is the consumer's
    * call — an export stage explodes `sequence(1, copies)` per shard,
    * never globally).
    *
    * @return (source, doc_id, rk, quota, copies), copies ≥ 1 — rows
    *         ranked past a sub-size quota are dropped
    */
  def upsampleQuotas(docs: DataFrame, tau: Double, target: Long,
                     idCol: String = "doc_id",
                     srcCol: String = "source"): DataFrame =
    upsampled(docs, tau, target, idCol, srcCol)
      .select(col("source"), col("doc_id"), col("rk"),
        col("rawQuota").as("quota"), col("copies"))

  /** The epochs-over-the-tail copy counts [[upsampleQuotas]] and
    * [[upsampleInterleaveOrder]] share — ONE definition point for the
    * copies formula (quota div n + the mod boundary), because the
    * interleave's epoch positions are defined AS the positions of those
    * copies in the source's quota-length stream: the two faces must
    * agree on exactly which copies exist.
    *
    * @return (source, doc_id, rk, n, rawQuota, copies), copies ≥ 1
    */
  private def upsampled(docs: DataFrame, tau: Double, target: Long,
                        idCol: String, srcCol: String): DataFrame =
    tauRanked(docs, tau, target, idCol, srcCol)
      .withColumn("copies",
        expr("rawQuota DIV n") +
          when(col("rk") <= col("rawQuota") % col("n"), 1L).otherwise(0L))
      .where(col("copies") > 0)

  /** Epoch-aware training order for an UPSAMPLED temperature mix —
    * [[interleaveOrder]] composed with [[upsampleQuotas]]' copies, so a
    * repeated document's copies spread through the epoch instead of the
    * consumer exploding them itself (and clumping them at one okey).
    * Copy j of the doc ranked rk sits at position (j−1)·n + rk in its
    * source's quota-length stream — the natural epochs-over-the-tail
    * order: epoch 1 is the whole source in stable hash order, epoch 2
    * repeats it, the final partial epoch holds the first quota mod n
    * docs. Positions are a BIJECTION onto 1..quota per source, so
    * okey = (pos − 0.5) / quota fills (0, 1) exactly as evenly as
    * [[interleaveOrder]] fills it for a downsampled source; both faces
    * interleave correctly against each other in one `.orderBy("okey",
    * "source", "doc_id")`. pos and quota are integers, so the division
    * is bit-identical on any IEEE engine.
    *
    * Scale shape: [[upsampleQuotas]]' plus one per-shard
    * `explode(sequence(1, copies))` — the repeats materialize
    * distributed, never globally; the consumer's sort is the same
    * range-partitioned global sort every okey consumer plans.
    *
    * @return one row per COPY: (source, doc_id, epoch, okey), epoch the
    *         1-based copy number
    */
  def upsampleInterleaveOrder(docs: DataFrame, tau: Double, target: Long,
                              idCol: String = "doc_id",
                              srcCol: String = "source"): DataFrame =
    upsampled(docs, tau, target, idCol, srcCol)
      .select(col("source"), col("doc_id"), col("rk"), col("n"),
        col("rawQuota"),
        explode(sequence(lit(1L), col("copies"))).as("epoch"))
      .select(col("source"), col("doc_id"), col("epoch"),
        ((((col("epoch") - 1L) * col("n") + col("rk")).cast("double") - 0.5)
          / col("rawQuota").cast("double")).as("okey"))

  /** Epoch-ordered shard assignment for an UPSAMPLED temperature mix —
    * the export step after [[upsampleInterleaveOrder]]: shard =
    * ⌊okey · nShards⌋ (clamped), so the shards are CONTIGUOUS TIME
    * SLICES of the interleaved epoch and a trainer reading shard 0..S−1
    * in file order consumes exactly the interleave order, copies
    * included, each copy whole in one shard. Because every source's
    * okeys are the even (i−0.5)/quota grid, each slice holds
    * ⌊quota/S⌋..⌈quota/S⌉ of EVERY source — shards are simultaneously
    * size-balanced and mixture-representative (each is an unbiased
    * slice of the mix), which [[shardAssign]]'s token balancing over a
    * hash order cannot promise for a weighted mix. okey · nShards is
    * one IEEE multiply of the (exact) okey — bit-identical floors on
    * any IEEE engine.
    *
    * Scale shape: [[upsampleInterleaveOrder]]'s plus one column
    * computation; the physical export is `repartition($"shard")` +
    * sort within partitions by (okey, source, doc_id) + partitionBy
    * write — one shuffle keyed by shard, no global sort.
    *
    * @return one row per copy: (shard, source, doc_id, epoch, okey)
    */
  def epochShards(docs: DataFrame, tau: Double, target: Long,
                  nShards: Int, idCol: String = "doc_id",
                  srcCol: String = "source"): DataFrame =
    upsampleInterleaveOrder(docs, tau, target, idCol, srcCol)
      .select(
        least(floor(col("okey") * nShards), lit(nShards - 1L))
          .cast("int").as("shard"),
        col("source"), col("doc_id"), col("epoch"), col("okey"))

  /** The physical export of [[epochShards]]: training-ready parquet
    * under `path/shard=N/`, each shard ONE file whose row order is the
    * interleave order (okey, source, doc_id) — so a dataloader reading
    * shard files 0..S−1 top to bottom consumes the epoch exactly as
    * [[upsampleInterleaveOrder]] laid it out, repeats included, with no
    * sort of its own.
    *
    * The ordering guarantee is structural: `repartition(S, $"shard")`
    * puts ALL of a shard's rows in one task (hash by shard value; two
    * shards sharing a task is fine — `partitionBy` still splits their
    * directories), and the within-task sort then makes each directory's
    * single file internally ordered. Without the repartition,
    * `partitionBy` would scatter every shard across every upstream task
    * — tasks × shards files with no cross-file order (the known
    * partitioned-write trap).
    *
    * Preconditions: (1) `(srcCol, idCol)` must be unique in `docs` —
    * the text join below keys on it, and a duplicate pair fans the
    * join out, writing duplicate rows into shards (the id may repeat
    * ACROSS sources; that case is handled by joining on the pair, not
    * the id alone). (2) `spark.sql.files.maxRecordsPerFile` must be
    * unset/0 — a nonzero value splits a shard directory into several
    * files and silently breaks the one-internally-ordered-file-per-
    * shard contract the dataloader relies on.
    *
    * @return the shard assignment that was written (shard, source,
    *         doc_id, epoch, okey) — text travels to parquet only
    */
  def writeEpochShards(docs: DataFrame, tau: Double, target: Long,
                       nShards: Int, path: String,
                       idCol: String = "doc_id",
                       srcCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    // precondition (2) enforced, not just documented: a nonzero
    // maxRecordsPerFile splits shard directories into several files
    // and silently voids the one-internally-ordered-file-per-shard
    // contract the dataloader reads by
    val mrpf = docs.sparkSession.conf
      .get("spark.sql.files.maxRecordsPerFile", "0")
    require(mrpf == "0",
      s"writeEpochShards requires spark.sql.files.maxRecordsPerFile=0 " +
        s"(found $mrpf): a per-file record cap would split shard " +
        "directories and break the one-ordered-file-per-shard contract")
    val assigned = epochShards(docs, tau, target, nShards, idCol, srcCol)
    assigned
      .join(docs.select(col(srcCol).as("source"), col(idCol).as("doc_id"),
          col(textCol).as("text")),
        Seq("source", "doc_id"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "okey", "source", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    assigned
  }

  /** Per-source corpus health report — the summary a pipeline owner
    * reads before and after every curation stage: document and exact-dup
    * counts, token totals, vocabulary size, type-token ratio, and mean
    * document length. One pass over the token stream (groupBy (source,
    * token) is vocabulary-sized after map-side combine) plus one over
    * the documents for fingerprint dup counting; the two tiny per-source
    * frames broadcast-join.
    *
    * At 100 TB the exact vocabulary count is the one piece of this
    * report that stops being free: `groupBy (source, token)` shuffles
    * the FULL open-domain vocabulary (the token-count sum itself is
    * map-side combinable either way). `approx = true` swaps that
    * distinct count for `approx_count_distinct` (Spark's built-in
    * HyperLogLog++, `rsd` relative error, default 1%) — a
    * constant-size sketch per (source, partition) that map-side
    * combines like any other aggregate, so the whole report becomes
    * one vocabulary-free pass. The exact mode stays the oracle twin
    * (the t32 sketch-vs-exact precedent); ExtSpec pins the approx
    * counts within 2% of exact on the fixture.
    *
    * @return (source, docs, dup_docs, tokens, distinct_tokens, ttr,
    *         mean_doc_tokens) — ttr and mean rounded to 4
    */
  def corpusStats(docs: DataFrame, idCol: String = "doc_id",
                  srcCol: String = "source",
                  textCol: String = "text",
                  approx: Boolean = false,
                  rsd: Double = 0.01): DataFrame = {
    val toks = docs.select(col(srcCol).as("source"),
      explode(expr(s"regexp_extract_all($textCol, '${TextAnalysis.TokenRe}', 0)"))
        .as("tok"))
    val tokStats =
      if (approx)
        toks.groupBy("source")
          .agg(count(lit(1)).as("tokens"),
            approx_count_distinct(col("tok"), rsd).as("distinct_tokens"))
      else toks
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("tokens"), count(lit(1)).as("distinct_tokens"))
    val docStats = docs
      .select(col(srcCol).as("source"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("source", "fp").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("docs"), (sum("c") - count(lit(1))).as("dup_docs"))
    docStats.join(broadcast(tokStats), Seq("source"), "left")
      .na.fill(0L, Seq("tokens", "distinct_tokens"))
      .select(col("source"), col("docs"), col("dup_docs"),
        col("tokens"), col("distinct_tokens"),
        round(col("distinct_tokens").cast("double") /
          greatest(col("tokens"), lit(1L)).cast("double"), 4).as("ttr"),
        round(col("tokens").cast("double") / col("docs").cast("double"), 4)
          .as("mean_doc_tokens"))
  }

  /** Deterministic source-interleaved training order over a temperature
    * mix: each kept document's epoch position is its fractional rank
    * within its source's quota, okey = (rk − 0.5) / quota — a source
    * contributing 10% of the mix surfaces evenly through the epoch
    * instead of clumping, which is what a trainer wants from a mixture
    * (the round-robin discipline of mixture dataloaders, computed
    * ahead of time as a sort key). Consumers `.orderBy("okey",
    * "source", "doc_id")` — a range-partitioned global sort, the
    * [[shuffleOrder]] scale shape; rk/quota are integers so the
    * division is bit-identical on any IEEE engine.
    *
    * @return (source, doc_id, okey) for the temperature-mix keep set
    */
  def interleaveOrder(docs: DataFrame, tau: Double, target: Long,
                      idCol: String = "doc_id",
                      srcCol: String = "source"): DataFrame =
    temperatureSample(docs, tau, target, idCol, srcCol)
      .select(col("source"), col("doc_id"),
        ((col("rk").cast("double") - 0.5) / col("quota").cast("double"))
          .as("okey"))

  /** Soft deduplication: instead of DROPPING near-duplicates, DOWNWEIGHT
    * them — every document gets sampling weight 1 / |its transitive
    * near-dup cluster| (singletons weigh 1), so a family of 20
    * boilerplate variants contributes one document's worth of mass to
    * training in expectation while keeping its internal diversity. The
    * alternative the hard keeper rule ([[Dedup.curateNearDups]])
    * throws away; mixture dataloaders consume the weight column
    * directly. Clusters are [[Dedup.duplicateClusters]]' transitive
    * closure (chains, not cliques — web near-dup families are chains);
    * the weight is an exact integer reciprocal, bit-identical on any
    * IEEE engine.
    *
    * @return one row per document: (doc_id, root, cluster_size, weight)
    *         — root = self and weight = 1.0 for singletons
    */
  def softDedupWeights(docs: DataFrame, tau: Double = 0.5, n: Int = 3,
                       idCol: String = "doc_id", textCol: String = "text",
                       shingled: Option[DataFrame] = None): DataFrame =
    softWeightsFromPairs(docs,
      Dedup.jaccardPairs(docs, n, tau, idCol = idCol, textCol = textCol,
        shingled = shingled),
      idCol)

  /** [[softDedupWeights]] over an ARBITRARY near-dup pair stream (a, b):
    * any signal — jaccard, winnow, simhash — feeds the same transitive-
    * closure downweighting. Weight = 1/|component|, singletons 1.0.
    */
  def softWeightsFromPairs(docs: DataFrame, pairs: DataFrame,
                           idCol: String = "doc_id"): DataFrame = {
    val clustered = Dedup.connectedComponents(pairs.select("a", "b"))
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("root")))
    docs.select(col(idCol).as("doc_id"))
      .join(clustered.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("root"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (lit(1.0) / coalesce(col("cluster_size"), lit(1L)).cast("double"))
          .as("weight"))
  }

  /** Temperature mixing by TOKEN mass under one global budget — the
    * composition of [[temperatureSample]]'s quota rule and
    * [[tokenBudgetSelect]]'s quality-ordered fill, which is how
    * multilingual mixtures are actually specified (α-scaled token
    * shares, not document counts): each source's token budget is
    * floor(totalBudget · w_s), w_s = round(m_s^τ / Σ_t m_t^τ, 9) over
    * the per-source TOKEN masses m_s, and the source fills it with its
    * best documents (quality desc, doc_id tie-break) until the next
    * doc would overflow. Same portability discipline as
    * temperatureSample (9dp-rounded weights before the floor); same
    * scale shape as tokenBudgetSelect (two-phase [[prefixSums]] — a
    * dominant source spans shards; token masses are one
    * map-side-combinable aggregate riding a broadcast join).
    *
    * @return (source, doc_id, toks, cum, budget) for the kept rows
    */
  def tokenBudgetMixture(docs: DataFrame, totalBudget: Long, tau: Double,
                         idCol: String = "doc_id", srcCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    val scored = docs
      .select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"),
        TextAnalysis.qualityScore(col(textCol)).as("q"))
    val sizes = scored.groupBy("source").agg(sum("toks").as("m"))
    val tot = sizes.agg(sum(pow(col("m"), lit(tau))).as("wsum"))
    val budgets = sizes.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(lit(totalBudget.toDouble) *
            round(pow(col("m"), lit(tau)) / col("wsum"), 9))
          .cast("long").as("budget"))
    prefixSums(scored, "source", "toks", Seq(col("q").desc, col("doc_id")))
      .join(broadcast(budgets), "source")
      .where(col("cum") <= col("budget"))
      .select(col("source"), col("doc_id"), col("toks"), col("cum"),
        col("budget"))
  }

  /** GPT-style sequence packing: concatenate each source's documents in
    * stable (doc_id) order and cut the token stream into fixed-`budget`
    * chunks — the packing step that turns a curated corpus into
    * training sequences. Documents may straddle chunks; output is one
    * row per (document, chunk it lands in):
    * (source, chunk_id, doc_id, tok_from, tok_to) with doc-relative
    * token offsets [tok_from, tok_to). Zero-token documents are skipped.
    *
    * Scale shape: the running sum is the two-phase [[prefixSums]] scan —
    * contiguous order-key shards with broadcast prefix offsets — so
    * neither a single global stream nor a Zipfian source distribution
    * serializes a reducer: every shard holds ~1/shards of the data
    * regardless of how documents distribute over sources.
    *
    * ROWS-frame note: duplicate (source, doc_id) rows are RANGE-frame
    * peers sharing one cumulative sum, which would overlap their token
    * spans and double-pack chunks — prefixSums uses a ROWS frame, giving
    * each row its own prefix.
    */
  def packChunks(docs: DataFrame, budget: Long,
                 idCol: String = "doc_id", srcCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("toks"))
    prefixSums(toks, "source", "toks", Seq(col("doc_id")))
      .withColumn("start", col("cum") - col("toks"))
      .where(col("toks") > 0)
      // a doc covers token span [start, cum) → chunks floor(start/B)..floor((cum-1)/B)
      .withColumn("chunk",
        explode(expr(s"sequence(start div $budget, (cum - 1) div $budget)")))
      .select(
        col("source"), col("chunk").as("chunk_id"), col("doc_id"),
        greatest(col("chunk") * budget - col("start"), lit(0L)).as("tok_from"),
        least((col("chunk") + 1) * budget - col("start"), col("toks")).as("tok_to"))
  }
}
