package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ext.Similarity

/** Streaming ANN index growth: embedding micro-batches appended to
  * persisted IVF/PQ indexes with in-stream compaction, checked
  * structurally exact (full probe / exhaustive shortlist) against brute
  * force over the final corpus.
  */
class StreamingAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    assert(q.awaitTermination(300000), "streaming query did not terminate")
    assert(q.exception.isEmpty, s"streaming query failed: ${q.exception}")
  }

  /** 60 deterministic unit-ish vectors in R^8. */
  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(d => (math.sin(i * 37.0 + d * 11.0) + 2.0).toFloat)

  private def embDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("nid"))).toSeq

  test("streamed IVF growth with compaction: grown index == brute force, history folded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 60L)
    val base = all.filter(_ % 3 == 0)
    val dir = Files.createTempDirectory("sann-ivf").toString
    val ckpt = Files.createTempDirectory("sann-ivf-ck").toString
    val c = Similarity.corpus(embDf(base))
    val cents = Similarity.ivfCentroids(c, nlist = 4).cache()
    Similarity.saveIvfIndex(dir, cents, Similarity.ivfMembership(c, cents))

    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    for (wave <- Seq(all.filter(_ % 3 == 1), all.filter(_ % 3 == 2))) {
      mem.addData(wave.map(i => (i, vec(i))): _*)
      drain(StreamingAnnIngest.startIvf(stream, dir, ckpt, compactEvery = 1))
    }

    val (cents2, membership) = Similarity.loadIvfIndex(spark, dir)
    assert(membership.count() == all.size, "a streamed vector is missing")
    val emb = embDf(all)
    assert(
      rows(Similarity.topkIvf(emb, Seq(0L, 1L, 2L), k = 5, nlist = 4, nprobe = 4,
        index = Some((cents2, membership)))) ==
        rows(Similarity.topkBruteForce(emb, Seq(0L, 1L, 2L), k = 5)))
    // batch 1's fold ran with commits {0} only — nothing foldable; a
    // third empty-start would fold b0. Drive one more wave to see it.
    mem.addData((100L, vec(100L)))
    drain(StreamingAnnIngest.startIvf(stream, dir, ckpt, compactEvery = 1))
    val segs = Option(new java.io.File(s"$dir/ivf_membership").listFiles)
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(!segs.contains("seg=b0"), s"b0 survived in-stream compaction: $segs")
    assert(segs.contains("seg=base"))
  }

  test("streamed PQ growth: grown index == brute force under exhaustive shortlist") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 60L)
    val base = all.filter(_ % 3 == 0)
    val dir = Files.createTempDirectory("sann-pq").toString
    val ckpt = Files.createTempDirectory("sann-pq-ck").toString
    val (books, codes) = Similarity.pqIndex(embDf(base))
    Similarity.savePqIndex(dir, books, codes)

    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    for (wave <- Seq(all.filter(_ % 3 == 1), all.filter(_ % 3 == 2))) {
      mem.addData(wave.map(i => (i, vec(i))): _*)
      drain(StreamingAnnIngest.startPq(stream, dir, ckpt, compactEvery = 2))
    }

    val (books2, codes2) = Similarity.loadPqIndex(spark, dir)
    assert(codes2.count() == all.size * 8)
    val emb = embDf(all)
    assert(
      rows(Similarity.topkPq(emb, Seq(0L, 1L, 2L), k = 5,
        shortlistFactor = 200000, index = Some((books2, codes2)))) ==
        rows(Similarity.topkBruteForce(emb, Seq(0L, 1L, 2L), k = 5)))
  }
}
