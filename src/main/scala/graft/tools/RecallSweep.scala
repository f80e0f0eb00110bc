package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN parameter-sweep harness (ROADMAP): recall@k vs brute force for
  * every approximate search variant across its tuning axis —
  *
  *   - IVF: nprobe (cells probed) at fixed nlist
  *   - PQ / int8: shortlistFactor (rerank budget)
  *   - IVF×PQ: the nprobe × shortlistFactor grid
  *   - hyperplane LSH pairs: tables, ± multi-probe
  *
  * Prints one JSON line per configuration:
  *   {"variant":"ivf","nprobe":4,"recall":0.84,"sec":1.2}
  * so the output is both human-scannable and machine-collectable.
  * Index build time is excluded (build once, search many — the
  * production shape); per-config time is search only.
  *
  * Usage: runMain graft.tools.RecallSweep [sfDir] [k]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val qids = (0L until 10L).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, sfDir, qids, k) finally spark.stop()
  }

  private def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def emit(variant: String, params: Seq[(String, Any)],
                   got: Set[(Long, Long)], truth: Set[(Long, Long)],
                   sec: Double): Unit = {
    val recall = if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
    val ps = params.map { case (n, v) => s"""\"$n\":$v""" }.mkString(",")
    val sep = if (params.nonEmpty) "," else ""
    println(f"""{"variant":"$variant"$sep$ps,"recall":$recall%.4f,"sec":$sec%.2f}""")
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def run(spark: SparkSession, sfDir: String, qids: Seq[Long], k: Int): Unit = {
    val emb = graft.ops.Io.readTable(spark, sfDir, "embeddings").cache()
    emb.count()
    val truth = topSet(Similarity.topkBruteForce(emb, qids, k))

    // build-once indexes, shared across the sweep
    val c = Similarity.corpus(emb).cache()
    val nlist = 16
    val cents = Similarity.ivfCentroids(c, nlist).cache()
    val membership = Similarity.ivfMembership(c, cents).cache()
    membership.count()
    val (books, codes) = Similarity.pqIndex(emb)
    books.cache().count(); codes.cache().count()

    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      val (got, sec) = timed(topSet(Similarity.topkIvf(
        emb, qids, k, nlist, nprobe, index = Some((cents, membership)))))
      emit("ivf", Seq("nlist" -> nlist, "nprobe" -> nprobe), got, truth, sec)
    }
    for (slf <- Seq(1, 2, 4, 8)) {
      val (got, sec) = timed(topSet(Similarity.topkPq(
        emb, qids, k, shortlistFactor = slf, index = Some((books, codes)))))
      emit("pq", Seq("shortlistFactor" -> slf), got, truth, sec)
    }
    for (slf <- Seq(1, 2, 4, 8)) {
      val (got, sec) = timed(topSet(Similarity.topkQuantized(
        emb, qids, k, shortlistFactor = slf)))
      emit("int8", Seq("shortlistFactor" -> slf), got, truth, sec)
    }
    for (nprobe <- Seq(2, 4, 8); slf <- Seq(2, 8)) {
      val (got, sec) = timed(topSet(Similarity.topkIvfPq(
        emb, qids, k, nlist = nlist, nprobe = nprobe, shortlistFactor = slf,
        residual = false, index = Some((books, codes)),
        ivfIndex = Some((cents, membership)))))
      emit("ivfpq", Seq("nprobe" -> nprobe, "shortlistFactor" -> slf),
        got, truth, sec)
    }

    // LSH near-dup pair recall (different ground truth: cosine pairs)
    val pairTruth = c.as("x").join(c.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Similarity.cosine(col("x.vec"), col("y.vec")).as("cos"))
      .where(col("cos") >= 0.35)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (tables <- Seq(2, 4, 8); mp <- Seq(false, true)) {
      val (got, sec) = timed(
        graft.ext.Dedup.embeddingNearDups(emb, tau = 0.35, planes = 4,
          tables = tables, multiProbe = mp)
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      emit("lsh_pairs", Seq("tables" -> tables, "multiProbe" -> mp),
        got, pairTruth, sec)
    }
  }
}
