package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Dedup

/** Quality/cost sweep for the clustered semantic dedup
  * ([[Dedup.semanticDedup]]): for each nlist, measure survivor
  * agreement against the exact all-pairs rule (nlist=1) and wall time
  * over the embeddings fixture — the RECALL.md counterpart for the
  * dedup decision (an ANN's recall sweep measures retrieved neighbors;
  * a dedup's measures retained documents).
  *
  * Agreement numbers reported:
  *   - drop_recall: of the docs the exact rule drops, the fraction the
  *     clustered rule also drops (cluster blocking only loses drops —
  *     exact survivors ⊆ clustered survivors, so precision is 1 by
  *     construction and this is the only number that can degrade);
  *   - extra_kept: clustered survivors not in the exact survivor set.
  *
  * Usage: runMain graft.tools.SemanticSweep [sfDir] [tau] [planted]
  *
  * `planted`: also append 100 deterministic near-copies (cos ≈ 0.998)
  * of fixture vectors before sweeping — the fixture has NO tight pairs
  * (0 at cos ≥ 0.7), so this is the only way to measure the regime
  * SemDeDup actually targets (tau ≥ 0.95, near-identical embeddings).
  */
object SemanticSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val planted = args.lift(2).contains("planted")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-semantic-sweep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = (if (!planted) base
      else {
        import spark.implicits._
        val src = base.orderBy(col("vec_id")).limit(100)
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        val copies = src.map { case (id, v) =>
          // deterministic ≈0.2% perturbation: cos(v, v') ≈ 0.998
          var h = id * 0x9e3779b97f4a7c15L
          val u = v.map { x =>
            h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
            x + 0.05f * ((h % 1000) / 1000.0f)
          }
          (1000000L + id, u)
        }
        base.unionByName(copies.toSeq.toDF("vec_id", "embedding"))
      }).cache()
    val n = emb.count()

    def survivors(nlist: Int): (Set[Long], Double) = {
      val t0 = System.nanoTime()
      val s = Dedup.semanticDedup(emb, tau, nlist)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      (s, (System.nanoTime() - t0) / 1e9)
    }

    // warm codegen/JIT once so the per-nlist walls compare fairly
    survivors(4)
    val (exact, exactSec) = survivors(1)
    val exactDropped = n - exact.size
    println(f"""{"nlist":1,"survivors":${exact.size},"dropped":$exactDropped,"sec":$exactSec%.2f,"drop_recall":1.0,"extra_kept":0}""")
    for (nlist <- Seq(4, 16, 64)) {
      val (surv, sec) = survivors(nlist)
      val extraKept = (surv -- exact).size
      val dropRecall =
        if (exactDropped == 0) 1.0
        else (exactDropped - extraKept).toDouble / exactDropped
      println(f"""{"nlist":$nlist,"survivors":${surv.size},"dropped":${n - surv.size},"sec":$sec%.2f,"drop_recall":$dropRecall%.3f,"extra_kept":$extraKept}""")
    }
    spark.stop()
  }
}
