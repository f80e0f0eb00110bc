package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Semantic-dedup sweep one decade above the fixture (ROADMAP r9 #2):
  * a deterministic 100k-vector synthetic corpus with latent cluster
  * structure and planted near-copies, swept at production-shaped
  * nlist ≈ 0.03%–0.3% · n. The fixture sweeps ([[SemanticSweep]],
  * RECALL.md) run at nlist ≤ 64 over ≤ 6k vectors — small enough that
  * the exact all-pairs rule is the oracle; at 100k the all-pairs
  * baseline is 5·10⁹ pairs, so ground truth here is the PLANTED pairs
  * (copy at cos ≈ 0.9999 of its source — the SemDeDup regime), and the
  * claims under measure are:
  *
  *   - drop recall on planted copies vs nlist (cluster blocking only
  *     loses a drop when copy and source straddle a cell boundary —
  *     at cos 0.9999 that should be rare at any nlist);
  *   - cell-size distribution (mean/p99/max) vs nlist — the
  *     "per-cell pair work stays bounded as nlist tracks 0.1%·n"
  *     constant the incremental index's cost model rests on;
  *   - wall time split into assignment (linear, n·nlist) and
  *     within-cell dedup (quadratic in cell size).
  *
  * Corpus: C = 200 latent clusters; vector j of source id =
  * 0.5·center(id % C, j) + u(id, j) with u, center hash-derived
  * uniforms in [-0.5, 0.5). The center term is deliberately WEAK:
  * same-cluster non-copy pairs sit at cos ≈ 0.2 ± 0.12 — a dominant
  * center would put the 25M-pair same-cluster tail across tau (at
  * mean 0.77, tau 0.95 is only ~2σ out), drowning the planted signal
  * in construction accidents; at mean 0.2 the threshold is ~6σ out
  * (≪ 1 expected false pair corpus-wide), which also matches real
  * embedding corpora, where near-ties at tau are rare and most mass
  * is mid-similarity. Copies (ids ≥ n) add a 0.02-scale perturbation
  * to their source's vector (cos ≈ 0.9998). Everything is
  * hash-derived from (id, j): no RNG state, generation is distributed
  * and replayable.
  *
  * Usage: runMain graft.tools.SemanticScale [n] [dim] [planted] [tau] [nlists]
  * where nlists is comma-separated (default "32,100,320" — production
  * shape 0.03%–0.3%·n at the 100k decade; pass "320,1000,3200" at 1M).
  */
object SemanticScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val planted = args.lift(2).map(_.toInt).getOrElse(1000)
    val tau = args.lift(3).map(_.toDouble).getOrElse(0.95)
    val nlists = args.lift(4).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(32, 100, 320))
    val clusters = 200
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semantic-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hash-uniform in [-0.5, 0.5): xxhash64 of the key tuple, folded to
    // 20 bits (plenty for a synthetic corpus; keeps the double exact)
    def u(keys: Column*): Column =
      (pmod(xxhash64(keys: _*), lit(1 << 20)).cast("double") /
        lit((1 << 20).toDouble)) - lit(0.5)
    val src = when(col("id") < n, col("id")).otherwise(col("id") - n)
    val cl = pmod(src, lit(clusters.toLong))
    val comps = (0 until dim).map { j =>
      val center = u(lit("c"), lit(j), cl) * lit(0.5)
      val noise = u(lit("u"), lit(j), src)
      val copyJitter =
        when(col("id") >= n, u(lit("p"), lit(j), col("id")) * lit(0.02))
          .otherwise(lit(0.0))
      (center + noise + copyJitter).cast("float")
    }
    val emb = spark.range(0, n.toLong + planted, 1, 32)
      .select(col("id").as("vec_id"), array(comps: _*).as("embedding"))
      .cache()
    emb.count()

    def pct(sizes: Array[Long], p: Double): Long = {
      val s = sizes.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }

    for (nlist <- nlists) {
      val t0 = System.nanoTime()
      val assigned = Dedup.clusterAssignment(emb, nlist).cache()
      assigned.count()
      val tAssign = (System.nanoTime() - t0) / 1e9
      val cellSizes = assigned.groupBy("cell").count()
        .collect().map(_.getLong(1))
      val t1 = System.nanoTime()
      val survivors = Dedup.semanticDedup(emb, tau, nlist,
          assignment = Some(assigned))
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val tDedup = (System.nanoTime() - t1) / 1e9
      val copyIds = (n.toLong until (n.toLong + planted)).toSet
      val plantedDropped = (copyIds -- survivors).size
      // a dropped source id (< n, not a planted copy target) is a
      // "collateral" drop: a genuine ≥ tau pair among the synthetic
      // base corpus, or (if recall analysis says otherwise) a bug
      val collateral = n - (survivors -- copyIds).size
      println(f"""{"nlist":$nlist,"n":${n + planted},"assign_sec":$tAssign%.2f,"dedup_sec":$tDedup%.2f,"planted_drop_recall":${plantedDropped.toDouble / planted}%.4f,"collateral_drops":$collateral,"cell_mean":${cellSizes.sum / cellSizes.length},"cell_p99":${pct(cellSizes, 0.99)},"cell_max":${cellSizes.max},"cells":${cellSizes.length}}""")
      assigned.unpersist(blocking = true)
    }
    spark.stop()
  }
}
