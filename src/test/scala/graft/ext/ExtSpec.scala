package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Extension operators validated against brute force on the sf0.001
  * fixtures (plus synthetic controlled cases).
  */
class ExtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.ops.Io.readTable(spark, dir, "documents").cache()
  private lazy val emb = graft.ops.Io.readTable(spark, dir, "embeddings").cache()

  test("minhash-LSH near-dups == brute-force jaccard pairs at tau=0.5") {
    val brute = Dedup.jaccardPairs(docs, n = 3, tau = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDuplicates(docs, n = 3, tau = 0.5, k = 128, bands = 64)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == brute) // verification fixes precision; params make recall ~1
  }

  test("simhash: identical docs collide at distance 0; pairs are verified") {
    val synth = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash(synth).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(synth, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("exact dedup groups catch case/punctuation variants") {
    val synth = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "something else")
    ).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(synth).collect()
    assert(groups.length == 2)
    val dupGroup = groups.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("keeper") == 1L)
  }

  test("IVF top-k recall vs brute force ≥ 0.6 at nprobe=4/nlist=16") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.topkBruteForce(emb, qids, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.topkIvf(emb, qids, 5, nlist = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("hyperplane-bucket embedding near-dups are a verified subset of brute force") {
    val c = Similarity.corpus(emb)
    val brute = c.as("x").join(c.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Similarity.cosine(col("x.vec"), col("y.vec")).as("cos"))
      .where(col("cos") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDups(emb, tau = 0.35, planes = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute)) // precision exact (cosine-verified)
    // 4 planes × 8 tables: per-pair collision ≈ 0.14/table → recall ≈ 0.7
    if (brute.nonEmpty)
      assert(lsh.size.toDouble / brute.size >= 0.4)
  }

  test("multimodal decode stub: deterministic metadata from binary payload") {
    val out = Multimodal.decodeDocs(spark, docs).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val n = r.getAs[Int]("n_bytes")
      assert(r.getAs[Int]("width") == 64 + n % 512)
      assert(r.getAs[Int]("height") == 64 + (n * 7) % 512)
      assert(r.getAs[Int]("n_frames") == 1 + n % 8)
    }
    // determinism: re-running yields identical rows
    val again = Multimodal.decodeDocs(spark, docs).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("language ID is deterministic and covers the fixture") {
    val out = docs.select(TextAnalysis.langId(col("text")).as("l")).collect()
    assert(out.forall(r => Set("en", "es", "de", "fr", "zh", "und").contains(r.getString(0))))
  }
}
