package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unigram-LM tokenizer: hand-exact Viterbi + tiebreak, the seeding
  * aggregate, and training invariants (segmentability, prob mass,
  * conservation through the encode join).
  */
class UnigramSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val fixture =
    spark.read.parquet(s"$dir/documents.parquet").limit(60).cache()

  test("viterbi: hand-exact segmentation and the shorter-piece tie rule") {
    val lp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -0.5)
    assert(Unigram.viterbi("ab", lp, 6) == List("ab"))
    assert(Unigram.viterbi("aab", lp, 6) == List("a", "ab"))
    assert(Unigram.viterbi("ba", lp, 6) == List("b", "a"))
    // exact tie ([aa] = -2 vs [a,a] = -2) → strict-improvement scan by
    // increasing length keeps the shorter pieces
    val tie = Map("a" -> -1.0, "aa" -> -2.0)
    assert(Unigram.viterbi("aa", tie, 6) == List("a", "a"))
    // unseen single chars segment via the floor, never fail
    assert(Unigram.viterbi("xy", Map("a" -> -1.0), 6) == List("x", "y"))
    assert(Unigram.viterbi("", lp, 6) == Nil)
  }

  test("seedVocab: hand-computed scores and ordering") {
    val d = Seq((0L, "aaa")).toDF("doc_id", "text")
    val got = Unigram.seedVocab(d, maxPieceLen = 6, seedSize = 10)
      .as[(String, Long)].collect().toSeq
    // substrings of aaa: a×3 (score 3), aa×2 (score 4), aaa×1 (score 3)
    // order: score desc then piece asc → aa, a, aaa
    assert(got == Seq(("aa", 4L), ("a", 3L), ("aaa", 3L)), s"got $got")
  }

  test("train: segmentability, prob mass, conservation, char retention") {
    val trained = Unigram.train(fixture, emIters = 3)
    // probability mass: Σ exp(logp) ≤ 1 + ε and every piece finite
    val mass = trained.pieces.values.map(math.exp).sum
    assert(mass <= 1.0 + 1e-9 && mass > 0.5, s"prob mass $mass")
    assert(trained.pieces.values.forall(v => !v.isNaN && !v.isInfinite))
    // every single char of the corpus dictionary survives pruning
    val dictToks = Bpe.wordDict(fixture).select("tok").as[String].collect()
    val chars = dictToks.flatMap(_.split("")).distinct
    assert(chars.forall(trained.pieces.contains), "pruned a single char")
    // every token segments into 1..len pieces
    val segs = trained.dict.as[(String, Long, Int)].collect()
    assert(segs.nonEmpty && segs.forall { case (t, _, n) => n >= 1 && n <= t.length })
    // multi-char pieces actually get used (the model compresses)
    val totalPieces = segs.map { case (_, f, n) => f * n }.sum
    val totalChars = segs.map { case (t, f, _) => f * t.length }.sum
    assert(totalPieces < totalChars, "no compression — EM degenerated to chars")
    // conservation through the encode join
    val viaDocs = Unigram.tokenCounts(fixture, trained)
      .agg(sum("n_tok")).as[Long].head()
    assert(viaDocs == totalPieces)
  }

  test("training is deterministic") {
    val a = Unigram.train(fixture, emIters = 2)
    val b = Unigram.train(fixture, emIters = 2)
    assert(a.pieces == b.pieces)
    assert(a.dict.orderBy("tok").as[(String, Long, Int)].collect().toSeq ==
      b.dict.orderBy("tok").as[(String, Long, Int)].collect().toSeq)
  }

  test("distributed E-step path ≡ in-memory path, bit-for-bit") {
    // force the distributed path (driverThreshold = 0) and compare the
    // full model against the driver loop: hard-EM counts are exact
    // LONGs, so the two paths must agree to the last bit in every logp
    val mem = Unigram.train(fixture, emIters = 3)
    val dist = Unigram.train(fixture, emIters = 3, driverThreshold = 0L)
    assert(mem.pieces.keySet == dist.pieces.keySet)
    val off = mem.pieces.keys.filter(p =>
      java.lang.Double.doubleToRawLongBits(mem.pieces(p)) !=
        java.lang.Double.doubleToRawLongBits(dist.pieces(p)))
    assert(off.isEmpty, s"logp bits differ for pieces: ${off.take(5).toSeq}")
    assert(mem.dict.orderBy("tok").as[(String, Long, Int)].collect().toSeq ==
      dist.dict.orderBy("tok").as[(String, Long, Int)].collect().toSeq)
  }
}
