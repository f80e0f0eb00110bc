package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ext.SemanticIndex

/** Incremental semantic dedup: a persisted SemanticIndex, batch dedup
  * against it, and the streaming keeper rule (cross-drop → in-batch
  * smaller-id rule → append survivors), including exactly-once replay —
  * the embedding twin of IncrementalDedupSpec.
  *
  * Cosines are hand-computable: orthogonal basis vectors → 0.0,
  * identical → 1.0, vA1 = (0.9, 0.1, 0, 0) vs vA = e1 →
  * 0.9/√0.82 ≈ 0.9939. tau = 0.5 separates cleanly.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    assert(q.awaitTermination(300000), "streaming query did not terminate")
    assert(q.exception.isEmpty, s"streaming query failed: ${q.exception}")
  }

  private val vA = Array(1f, 0f, 0f, 0f)
  private val vB = Array(0f, 1f, 0f, 0f)
  private val vC = Array(0f, 0f, 1f, 0f)
  private val vD = Array(0f, 0f, 0f, 1f)
  private val vA1 = Array(0.9f, 0.1f, 0f, 0f) // ≈0.9939 vs vA

  private def df(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("build + load round-trip; dedupBatch reports cross pairs with exact cosine") {
    val path = Files.createTempDirectory("semidx").toString
    SemanticIndex.build(df((1L, vA), (2L, vB), (3L, vC)), path,
      nlist = 1, normalized = false)
    val idx = SemanticIndex.load(spark, path)
    assert((idx.nlist, idx.normalized) == ((1, false)))
    val got = idx.dedupBatch(df((101L, vA), (102L, vA1), (103L, vD)), tau = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2))
      .toSeq
    assert(got.map(x => (x._1, x._2)) == Seq((101L, 1L), (102L, 1L)))
    assert(got(0)._3 == 1.0)
    assert(math.abs(got(1)._3 - 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)) < 1e-6)
  }

  test("streamed batches: cross-drop, in-batch smaller-id keeper, survivors indexed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxPath = Files.createTempDirectory("semidx-s").toString
    val vPath = Files.createTempDirectory("semv").toString
    val ckpt = Files.createTempDirectory("semckpt").toString
    SemanticIndex.build(df((1L, vA), (2L, vB)), idxPath,
      nlist = 1, normalized = false)

    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")

    // batch 0: 101 dups the index (vA), 102/103 dup each other (keeper
    // 102), 104 near-dups the index (vA1 vs vA)
    mem.addData((101L, vA), (102L, vD), (103L, vD), (104L, vA1))
    drain(StreamingSemanticDedup.start(stream, idxPath, vPath, ckpt, tau = 0.5))

    def verdicts(batch: Long): Map[Long, (String, Option[Long])] =
      spark.read.parquet(vPath)
        .where(s"batch = $batch")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
    assert(verdicts(0) == Map(
      101L -> ("dup_index", Some(1L)),
      102L -> ("kept", None),
      103L -> ("dup_batch", Some(102L)),
      104L -> ("dup_index", Some(1L))))

    // batch 1 (restart from the same checkpoint): 201 dups the vector
    // kept in batch 0 — proving survivors were indexed; 202 is new
    mem.addData((201L, vD), (202L, vC))
    drain(StreamingSemanticDedup.start(stream, idxPath, vPath, ckpt, tau = 0.5))
    assert(verdicts(1) == Map(
      201L -> ("dup_index", Some(102L)),
      202L -> ("kept", None)))

    val indexed = spark.read.parquet(s"$idxPath/members")
      .select("id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 102L, 202L))
  }

  test("compact folds cell-partitioned segments into base; verdicts identical") {
    import spark.implicits._
    val path = Files.createTempDirectory("semidx-c").toString
    SemanticIndex.build(df((1L, vA), (2L, vB)), path,
      nlist = 1, normalized = false)
    val idx = SemanticIndex.load(spark, path)
    idx.append(df((10L, vC)), seg = "b0")
    idx.append(df((20L, vD)), seg = "b1")

    val probe = df((101L, vA), (102L, vC), (103L, vD), (104L, vA1))
    def verdicts(i: SemanticIndex): Seq[(Long, Long, Double)] =
      i.dedupBatch(probe, tau = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val before = verdicts(idx)
    assert(before.map(v => (v._1, v._2)) ==
      Seq((101L, 1L), (102L, 10L), (103L, 20L), (104L, 1L)))

    assert(idx.compact(Seq("b0", "b1")).sorted == Seq("b0", "b1"))
    val segs = Option(new java.io.File(s"$path/members").listFiles)
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(segs == Set("seg=base"), s"only base should remain: $segs")
    // the cell sub-layout survives the fold (directory pruning keeps
    // working on the compacted base)
    val cells = Option(new java.io.File(s"$path/members/seg=base").listFiles)
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(cells == Set("cell=0"), s"cell sub-dirs must survive: $cells")
    assert(verdicts(SemanticIndex.load(spark, path)) == before)
    assert(idx.compact(Seq("b0", "b1")).isEmpty, "re-fold is a no-op")
  }

  test("clustered index: cell partition filter prunes the member scan") {
    val path = Files.createTempDirectory("semidx-p").toString
    // 8 vectors in 4 tight clusters around the basis directions
    val rows = Seq(
      0L -> vA, 1L -> vA1, 2L -> vB, 3L -> vC, 4L -> vD,
      5L -> Array(0f, 0.9f, 0.1f, 0f), 6L -> Array(0f, 0f, 0.9f, 0.1f),
      7L -> Array(0.1f, 0f, 0f, 0.9f))
    SemanticIndex.build(df(rows: _*), path, nlist = 4)
    val idx = SemanticIndex.load(spark, path)
    val plan = idx.dedupBatch(df((100L, vA)), tau = 0.5)
      .queryExecution.executedPlan.toString
    // the plan holds several scans (centroids broadcast + members) —
    // the members scan is whichever one carries partition filters
    val pfs = plan.split("PartitionFilters: ").drop(1).map(_.takeWhile(_ != ']'))
    assert(pfs.exists(_.contains("cell")),
      s"member scan must carry a cell partition filter, got: ${pfs.mkString(" | ")}\n$plan")
    // and the touched-cell dedup still finds the right dup
    val got = idx.dedupBatch(df((100L, vA)), tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 0L)))
  }

  test("zero-norm vectors: assigned deterministically, never dup, never throw") {
    // an all-zero embedding (an empty document) is expected input per
    // corpusNormalized's guard — before cosineSafe the k-means assign
    // threw ANSI DIVIDE_BY_ZERO on it (found by SemanticSoak batch 0)
    val zero = Array(0f, 0f, 0f, 0f)
    val path = Files.createTempDirectory("semidx-z").toString
    SemanticIndex.build(df((1L, vA), (2L, vB), (3L, vC), (4L, vD), (5L, zero)),
      path, nlist = 2)
    val idx = SemanticIndex.load(spark, path)
    val got = idx.dedupBatch(df((100L, zero), (101L, vA)), tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists(_._1 == 100L), s"zero vector must dup nothing: $got")
    assert(got.contains((100L, 0L)) == false)
    assert(got.exists(_._1 == 101L), s"nonzero dup must still be found: $got")
    // batch form too: exact mode with a raw zero vector
    val surv = graft.ext.Dedup
      .semanticDedup(df((1L, vA), (2L, zero), (3L, vA)), tau = 0.5,
        nlist = 1, normalized = false)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 2L), s"zero vec survives, dup of vA dropped: $surv")
  }

  test("replaying a batch rewrites its segment and verdicts: exactly-once") {
    val idxPath = Files.createTempDirectory("semidx-r").toString
    val vPath = Files.createTempDirectory("semv-r").toString
    SemanticIndex.build(df((1L, vA)), idxPath, nlist = 1, normalized = false)
    val batch = df((10L, vB), (11L, vB))

    StreamingSemanticDedup.processBatch(batch, 7L, idxPath, vPath, tau = 0.5)
    StreamingSemanticDedup.processBatch(batch, 7L, idxPath, vPath, tau = 0.5)

    val members = spark.read.parquet(s"$idxPath/members")
    // base(1) + keeper 10 — NOT doubled by the replay
    assert(members.count() == 2)
    assert(members.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 10L))
    val v = spark.read.parquet(vPath).where("batch = 7")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "kept", 11L -> "dup_batch"))
  }

  test("randomized batches: index == keeper set, every drop justified, fold invariant") {
    import spark.implicits._
    // deterministic pseudo-random vectors (hash-mixed, no RNG state)
    def rv(salt: Long, i: Long): Array[Float] = {
      var h = salt * 0x9e3779b97f4a7c15L + i * 0xc2b2ae3d27d4eb4fL + 1
      Array.fill(8) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
        (h % 1000) / 1000.0f
      }
    }
    val idxPath = Files.createTempDirectory("semidx-rand").toString
    val vPath = Files.createTempDirectory("semv-rand").toString
    val seed = (0L until 40L).map(i => (i, rv(-1, i)))
    SemanticIndex.build(seed.toDF("vec_id", "embedding"), idxPath, nlist = 4)

    val batches = (0 until 4).map { b =>
      // fresh + some exact copies of seed and in-batch vectors → all
      // three verdict paths exercised with unpredictable cell layouts
      (0 until 24).map(i => (1000L * (b + 1) + i, rv(b.toLong, i))) ++
        (0 until 3).map(i => (1000L * (b + 1) + 100 + i, rv(-1, (b * 7 + i) % 40))) ++
        (0 until 3).map(i => (1000L * (b + 1) + 200 + i, rv(b.toLong, i)))
    }
    batches.zipWithIndex.foreach { case (rows, b) =>
      StreamingSemanticDedup.processBatch(rows.toDF("vec_id", "embedding"),
        b.toLong, idxPath, vPath, tau = 0.98)
    }

    val verdicts = spark.read.parquet(vPath)
      .select("vec_id", "verdict", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val keepers = verdicts.collect { case (id, "kept", _) => id }.toSet
    val dropped = verdicts.filter(_._2 != "kept")
    // exactly one verdict per delivered id
    assert(verdicts.map(_._1).distinct.length == verdicts.length)
    // the index holds exactly seed ∪ keepers
    val members = spark.read.parquet(s"$idxPath/members")
      .select("id").as[Long].collect().toSet
    assert(members == (seed.map(_._1).toSet ++ keepers),
      s"index (${members.size}) must equal seed+keepers (${seed.size + keepers.size})")
    // every drop names its duplicate, and a cross-drop's dup_of is an
    // EARLIER keeper or a seed vector (never a later arrival)
    dropped.foreach { case (id, verdict, dupOf) =>
      assert(dupOf.isDefined, s"$id dropped without dup_of")
      if (verdict == "dup_index")
        assert(members.contains(dupOf.get), s"$id dup_of ${dupOf.get} not indexed")
    }
    // folding committed history never changes a dedup verdict
    val probe = (0 until 20).map(i => (9000L + i, rv(99, i))).toDF("vec_id", "embedding")
    val idx = SemanticIndex.load(spark, idxPath)
    def probeVerdicts(i: SemanticIndex): Seq[(Long, Long)] =
      i.dedupBatch(probe, tau = 0.98).select("vec_id", "dup_of")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val before = probeVerdicts(idx)
    assert(idx.compact(Seq("b0", "b1", "b2")).sorted == Seq("b0", "b1", "b2"))
    assert(probeVerdicts(SemanticIndex.load(spark, idxPath)) == before)
  }

  test("same vec_id delivered twice in one batch: one member row, one verdict") {
    // the in-batch rule's strict x.id < y.id can never pair an id with
    // itself — without the up-front dropDuplicates a re-delivered id
    // appended twice and wrote two 'kept' verdicts
    val idxPath = Files.createTempDirectory("semidx-d").toString
    val vPath = Files.createTempDirectory("semv-d").toString
    SemanticIndex.build(df((1L, vA)), idxPath, nlist = 1, normalized = false)
    val batch = df((10L, vB), (10L, vB), (11L, vC))

    StreamingSemanticDedup.processBatch(batch, 3L, idxPath, vPath, tau = 0.5)

    val members = spark.read.parquet(s"$idxPath/members")
    assert(members.count() == 3, "base(1) + 10 + 11, id 10 NOT doubled")
    val v = spark.read.parquet(vPath).where("batch = 3").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(v.length == 2, s"one verdict per distinct id: ${v.toSeq}")
    assert(v.toMap == Map(10L -> "kept", 11L -> "kept"))
  }
}
