package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump `explain("formatted")` for INTERNAL operator frames
  * the registered queries don't expose as their result plan — the plan
  * evidence channel for optimizations that live below a query's surface
  * (e.g. the PQ encode scan, which runs during the warm index build: the
  * s05 row's own plan is just the search over the cached index).
  *
  * {{{ sbt "runMain graft.tools.PlanDump pqEncode /root/testdata/sf0.1" }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    what match {
      case "pqEncode" =>
        val c = graft.ext.Similarity.corpus(emb)
        val books = graft.ext.Similarity.pqCodebooks(c, m = 8, k = 256)
        graft.ext.Similarity.pqEncode(c, books, m = 8).explain("formatted")
      case "ivfAssign" =>
        graft.ext.Similarity.ivfAssign(emb, nlist = 8).explain("formatted")
      case other => sys.error(s"unknown frame: $other")
    }
    spark.stop()
  }
}
