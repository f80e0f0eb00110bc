package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Scale evidence for the learned-BPE trainer's central claim: the merge
  * loop costs dictionary, not corpus. Synthesizes word-soup corpora from
  * a fixed 50k-word vocabulary at n and 10n documents — the DICTIONARY is
  * the same size at both scales, so the corpus-scan phase (wordDict)
  * should scale ~linearly with n while the distributed merge loop
  * (pairCounts → argmax → applyMerge, driverThreshold = 0) stays ~flat.
  *
  * Prints one JSON line per scale:
  *   {"n":100000,"dict_rows":50211,"scan_sec":3.1,"merge_sec":5.2,"merges":10}
  *
  * Usage: runMain graft.tools.BpeScale [nBase] [merges]
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val merges = args.lift(1).map(_.toInt).getOrElse(10)
    val deepMerges = args.lift(2).map(_.toInt).getOrElse(1000)
    val mode = args.lift(3).getOrElse("all") // all | deeponly | wideonly
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-bpe-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    // JIT/codegen warmup at a small scale so the first timed point isn't
    // paying compilation (first run measured the base scale SLOWER than
    // 10× without this)
    for (n <- (if (mode != "all") Seq.empty[Int]
               else Seq(nBase / 10, nBase, nBase * 10))) {
      // distributed synthesis: 12 words per doc from the fixed vocab
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          udfFreeWord(col("id"), j)): _*).as("text"))
      val t0 = System.nanoTime()
      val dict = Bpe.wordDict(docs).localCheckpoint()
      val dictRows = dict.count()
      val scanSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var d = dict
      var step = 0
      while (step < merges) {
        val best = Bpe.pairCounts(d)
          .orderBy(desc("cnt"), col("a"), col("b")).limit(1).collect()
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        d = d.withColumn("syms", Bpe.applyMerge(col("syms"), a, b))
        step += 1
        if (step % 5 == 0) d = d.localCheckpoint()
      }
      d.count(): Unit
      val mergeSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"n":$n,"dict_rows":$dictRows,"scan_sec":$scanSec%.2f,"merge_sec":$mergeSec%.2f,"merges":$merges}""")
    }

    // Deep-merge evidence (r8 verdict #4): the batched distributed
    // trainer at production-shaped depth — total Spark JOBS must be
    // ≪ merges (rounds × ~2, one top-K collect + the pc checkpoint per
    // round; batch width ≫ 1 on any realistically SKEWED pair
    // distribution), and per-merge wall ~flat when the corpus grows
    // 10×. The deep corpus draws words POWER-LAW (P(k) head-heavy, the
    // natural-language shape): a uniform draw gives near-uniform pair
    // counts whose constant exact ties trim every batch to one merge —
    // an adversarial corpus no real text resembles. The job counter is
    // the direct refutation of the old one-argmax-collect-per-merge
    // shape.
    for (n <- (if (mode == "wideonly") Seq.empty[Int] else Seq(nBase, nBase * 10))) {
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          zipfWord(col("id"), j)): _*).as("text"))
      Thread.sleep(300) // drain listener before the window
      val j0 = jobCount.get
      val t0 = System.nanoTime()
      val trained = Bpe.train(docs, numMerges = deepMerges,
        minCount = 2L, driverThreshold = 0L)
      val got = trained.merges.length
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val jobs = jobCount.get - j0
      println(f"""{"deep_n":$n,"merges":$got,"jobs":$jobs,"wall_sec":$wall%.1f,"ms_per_merge":${wall * 1000 / math.max(got, 1)}%.1f}""")
    }

    // WIDE (parallel-BPE) deep rows: rounds ≈ merges / maxBatch, so the
    // job counter should land 1–2 orders below the exact rows above —
    // plus the quality probe: merge-set overlap and encoded-token delta
    // vs the exact-sequential vocabulary on the base corpus.
    if (mode != "deeponly") {
      var exactMerges: Set[(String, String)] = Set.empty
      var exactToks = 0L
      for ((n, doWide) <- Seq((nBase, false), (nBase, true),
                              (nBase * 10, true))) {
        val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 12).map(j =>
            zipfWord(col("id"), j)): _*).as("text"))
        Thread.sleep(300)
        val j0 = jobCount.get
        val t0 = System.nanoTime()
        val trained = Bpe.train(docs, numMerges = deepMerges,
          minCount = 2L, driverThreshold = 0L, wide = doWide)
        val got = trained.merges.length
        val toks = trained.dict
          .agg(sum(col("f") * size(col("syms")))).head.getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val jobs = jobCount.get - j0
        val ms = trained.merges.map(m => (m._1, m._2)).toSet
        if (!doWide) { exactMerges = ms; exactToks = toks }
        val overlap =
          if (doWide && n == nBase && exactMerges.nonEmpty)
            f""","merge_overlap":${(ms & exactMerges).size},"exact_tokens":$exactToks"""
          else ""
        println(f"""{"wide_n":$n,"wide":$doWide,"merges":$got,"jobs":$jobs,"wall_sec":$wall%.1f,"tokens":$toks$overlap}""")
      }
    }
    spark.stop()
  }

  /** Deterministic per-(doc, slot) word from the 50k vocabulary — pure
    * Column expression (xxhash64), no UDF, ANSI-safe.
    */
  private def udfFreeWord(id: org.apache.spark.sql.Column, j: Int) =
    concat(lit("w"), pmod(xxhash64(id, lit(j)), lit(50000L)).cast("string"))

  /** Power-law word draw shaped like natural text in the three
    * properties the batch width depends on — because the strict-
    * equivalence batch can only take top pairs sharing NO symbol, its
    * width is set by how symbol-diverse the head of the pair
    * distribution is:
    *
    *   - Zipf-ish frequencies (u⁴-transformed uniform: pmf ∝ k^(-3/4),
    *     head word ~6.7% of mass — natural-language scale);
    *   - Zipf's law of abbreviation: frequent words are SHORT (length
    *     grows ~log rank, 2 → 8 symbols), so a head word is fully
    *     merged into one token after length−1 merges and stops
    *     blocking, instead of serializing the whole loop;
    *   - hash spellings over a ~36-symbol alphabet (base-36 md5), so
    *     fragments are word-specific the way real subwords are. The
    *     first deep run spelled ranks as "w"+digits — 11 symbols shared
    *     by EVERY word — and measured 3,101 jobs for 1,000 merges:
    *     batch width 1 by construction, an adversarial alphabet no
    *     real corpus has.
    */
  private def zipfWord(id: org.apache.spark.sql.Column, j: Int) = {
    val u = pmod(xxhash64(id, lit(j)), lit(1000000L)).cast("double") / 1000000.0
    val k = floor(u * u * u * u * 50000.0).cast("long")
    val len = (lit(2) + floor(log10(k.cast("double") + lit(1.0)))
      + when(k >= 10000L, 2).otherwise(0)).cast("int")
    lower(conv(substring(md5(k.cast("string")), 1, 12), 16, 36))
      .substr(lit(1), len)
  }
}
