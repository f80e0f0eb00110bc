package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization",
  * arXiv:1804.10959 — the SentencePiece unigram trainer), the second
  * canonical subword tokenizer next to [[Bpe]]. Same scale architecture:
  * the corpus folds into the pre-token frequency dictionary ONCE (the
  * only data-sized step), and everything else — seed-vocabulary
  * extraction, every EM iteration, final encoding — runs over
  * vocabulary-sized tables.
  *
  * - Seed vocabulary: frequent substrings of dictionary pre-tokens
  *   (length ≤ maxPieceLen) scored by occurrence-count × length, the
  *   paper's seeding heuristic. A pure aggregate — SQL-expressible, so
  *   t24 value-gates it end to end.
  * - EM: E-step Viterbi-segments each DISTINCT pre-token under the
  *   current piece log-probs (mapPartitions over the dictionary with the
  *   broadcast piece table — the centroid-collect precedent bounds the
  *   driver copy by vocab size), accumulating expected piece counts
  *   weighted by pre-token frequency; M-step renormalizes. Pieces whose
  *   count drops to zero are pruned, single characters never (every
  *   token stays segmentable).
  * - Viterbi tiebreak: candidates are scanned by increasing piece
  *   length and updated on STRICT improvement, so equal-likelihood
  *   splits deterministically prefer the shorter final piece.
  * - Encoding: per-doc piece counts = the same explode → dictionary
  *   equi-join → sum as [[Bpe.tokenCounts]].
  */
object Unigram {

  /** Seed vocabulary: substrings (length 1..maxPieceLen) of dictionary
    * pre-tokens, scored by total occurrence count × length, top
    * `seedSize` with a deterministic (score desc, piece asc) order.
    * Single characters are always implicitly part of the final vocab;
    * the seed may include them naturally.
    */
  def seedVocab(docs: DataFrame, maxPieceLen: Int = 6, seedSize: Int = 200,
                textCol: String = "text"): DataFrame =
    seedVocabFromDict(Bpe.wordDict(docs, textCol).drop("syms"),
      maxPieceLen, seedSize)

  /** [[seedVocab]] over an already-built pre-token dictionary (tok, f) —
    * lets [[train]] fold the corpus once and reuse the frame.
    */
  def seedVocabFromDict(dict: DataFrame, maxPieceLen: Int = 6,
                        seedSize: Int = 200): DataFrame = {
    // substrings via a nested transform (expr spelling — substring with
    // lambda-variable pos/len); Generate re-eval is bounded by word
    // length² on a DICTIONARY-sized input (the Bpe.pairCounts note)
    dict.select(col("f"), col("tok"))
      .select(col("f"), explode(expr(
        s"flatten(transform(sequence(1, length(tok)), i -> " +
          s"transform(sequence(1, least($maxPieceLen, length(tok) - i + 1)), " +
          s"l -> substring(tok, i, l))))")).as("piece"))
      .groupBy("piece").agg(sum(col("f") * length(col("piece"))).as("score"))
      .orderBy(desc("score"), col("piece"))
      .limit(seedSize)
  }

  /** A trained unigram tokenizer: (piece, logp) plus the dictionary with
    * per-token segment counts (tok, f, n_pieces).
    */
  final case class UnigramLmTok(pieces: Map[String, Double], dict: DataFrame)

  /** Train by EM over the pre-token dictionary. `emIters` rounds of
    * Viterbi E-step + renormalizing M-step; zero-count pieces prune each
    * round, single chars are retained unconditionally.
    *
    * Scale-adaptive like [[Bpe.train]]: dictionaries up to
    * `driverThreshold` rows collect once and loop on the driver; past
    * it the dictionary never leaves the executors — each E-step is one
    * mapPartitions (broadcast piece table) folding into a
    * vocabulary-sized count table, and only THAT collects. Viterbi
    * piece counts are exact LONGs (hard-EM counts are integer multiples
    * of the pre-token frequency), so the two paths produce bit-identical
    * models regardless of partition order — pinned by UnigramSpec.
    */
  def train(docs: DataFrame, maxPieceLen: Int = 6, seedSize: Int = 200,
            emIters: Int = 4, textCol: String = "text",
            driverThreshold: Long = 2000000L): UnigramLmTok = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the corpus folds into the pre-token dictionary ONCE (the only
    // data-sized step); seeding, every EM round, and the final encode
    // all reuse this frame
    val dictDf = Bpe.wordDict(docs, textCol).drop("syms").localCheckpoint()
    val seed = seedVocabFromDict(dictDf, maxPieceLen, seedSize)
      .as[(String, Long)].collect()
    // alphabet-sized (Spark's split keeps a trailing "" — drop it)
    val chars = dictDf
      .select(explode(split(col("tok"), "")).as("c"))
      .where(length(col("c")) > 0).distinct()
      .as[String].collect()
    var probs: Map[String, Double] = {
      val base = seed.map { case (p, s) => p -> s.toDouble }.toMap
      val withChars = chars.foldLeft(base)((m, c) =>
        if (m.contains(c)) m else m + (c -> 1.0))
      val tot = withChars.values.sum
      withChars.map { case (p, s) => p -> math.log(s / tot) }
    }
    val maxLen = maxPieceLen
    val small = dictDf.count() <= driverThreshold
    val dict: Array[(String, Long)] =
      if (small) dictDf.as[(String, Long)].collect() else Array.empty
    var iter = 0
    while (iter < emIters) {
      val counts: Map[String, Long] =
        if (small) {
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          dict.foreach { case (tok, f) =>
            viterbi(tok, probs, maxLen).foreach { p =>
              m(p) = m.getOrElse(p, 0L) + f
            }
          }
          m.toMap
        } else {
          val bc = spark.sparkContext.broadcast(probs)
          dictDf.as[(String, Long)]
            .mapPartitions(_.flatMap { case (tok, f) =>
              viterbi(tok, bc.value, maxLen).map(p => (p, f))
            })
            .toDF("piece", "c")
            .groupBy("piece").agg(sum("c").as("c"))
            .as[(String, Long)].collect().toMap
        }
      val kept = probs.keys.filter(p =>
        p.length == 1 || counts.getOrElse(p, 0L) > 0L)
      // floor unused single chars at a count of 1 (log stays finite)
      // BEFORE normalizing, so the distribution still sums to 1
      val floored = kept.map(p => p -> math.max(counts.getOrElse(p, 0L),
        if (p.length == 1) 1L else 0L)).toMap
      val tot = math.max(floored.values.sum, 1L)
      probs = floored.map { case (p, c) =>
        p -> math.log(c.toDouble / tot.toDouble)
      }
      iter += 1
    }
    val bc = spark.sparkContext.broadcast(probs)
    val encoded = dictDf
      .as[(String, Long)]
      .mapPartitions(_.map { case (tok, f) =>
        (tok, f, viterbi(tok, bc.value, maxLen).length)
      })
      .toDF("tok", "f", "n_pieces")
    UnigramLmTok(probs, encoded)
  }

  /** Deterministic Viterbi segmentation under piece log-probs: best[i] =
    * max over pieces ending at i; candidates scanned by increasing
    * length, strict improvement only (shorter piece wins ties). Single
    * chars are assumed present (train guarantees it); unseen single
    * chars score log(1e-12) so any token segments.
    */
  def viterbi(tok: String, logp: Map[String, Double],
              maxPieceLen: Int): List[String] = {
    val n = tok.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val piece = tok.substring(i - l, i)
        val lp = logp.getOrElse(piece,
          if (l == 1) math.log(1e-12) else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity &&
          best(i - l) + lp > best(i)) {
          best(i) = best(i - l) + lp
          back(i) = l
        }
        l += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      out = tok.substring(p - l, p) :: out
      p -= l
    }
    out
  }

  /** Per-document piece counts under a trained tokenizer — the same
    * explode → vocabulary-join → sum as [[Bpe.tokenCounts]].
    */
  def tokenCounts(docs: DataFrame, trained: UnigramLmTok,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(regexp_extract_all(col(textCol),
        lit(TextAnalysis.BpeRe), lit(0))).as("tok"))
    toks.join(trained.dict.select("tok", "n_pieces"), "tok")
      .groupBy(idCol).agg(sum("n_pieces").as("n_tok"))
  }
}
