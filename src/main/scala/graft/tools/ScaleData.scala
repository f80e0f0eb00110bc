package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-checkpoint data builder (r13 verdict #3): the driver ships
  * fixtures up to sf0.1 only, so the whole-suite scale datapoint
  * SCALE.md's projections lean on is synthesized here as N DISJOINT
  * sf0.1-shaped shards — each table unioned N× with every key banded
  * into its own id space (key + copy · 10⁷) and content transformed
  * per copy so no text/embedding duplication crosses shards:
  *
  *   - documents: copy 1 reverses the text, copy 2 rotates its halves —
  *     lengths, charsets, and WITHIN-shard duplicate topology are
  *     preserved (a reversed dup pair is still a dup pair), so each
  *     shard poses exactly sf0.1's workload and the corpus totals
  *     scale by N with NO new cross-shard candidates (which cloned
  *     text would manufacture and which no real 3× crawl exhibits);
  *   - embeddings: copy 1 negates components, copy 2 reverses the
  *     vector — both are isometries, so within-shard cosine structure
  *     (ANN topology, cluster shapes) is exactly sf0.1's;
  *   - TPC-H facts band ALL keys by the same offset so FK joins stay
  *     closed within a shard; region/nation stay as-is (dimension
  *     tables are constant across TPC-H scale factors);
  *   - events bands event_id/user_id and keeps timestamps: N× metric
  *     cardinality over the same time range, the realistic way a
  *     metrics store grows.
  *
  * {{{ sbt "runMain graft.tools.ScaleData /root/testdata/sf0.1 target/sf0.3 3" }}}
  */
object ScaleData {

  private val Band = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf0.3")
    val copies = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-data")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emit(table: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map(i => xform(base, i)).reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"$table: ${out.count()} rows")
    }
    def band(c: String, i: Int) = (col(c) + lit(i * Band)).as(c)

    // dimension tables: constant across TPC-H scale factors
    Seq("region", "nation").foreach { t =>
      emit(t)((df, i) => if (i == 0) df else df.limit(0))
    }
    emit("customer")((df, i) => df.select(band("c_custkey", i),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
    emit("supplier")((df, i) => df.select(band("s_suppkey", i),
      col("s_name"), col("s_nationkey"), col("s_acctbal")))
    emit("part")((df, i) => df.select(band("p_partkey", i), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")))
    emit("orders")((df, i) => df.select(band("o_orderkey", i),
      band("o_custkey", i), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")))
    emit("lineitem")((df, i) => df.select(band("l_orderkey", i),
      band("l_partkey", i), band("l_suppkey", i), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")))
    emit("events")((df, i) => df.select(band("event_id", i), col("ts"),
      band("user_id", i), col("event_type"), col("value"), col("props")))
    emit("documents") { (df, i) =>
      val t = i % 3 match {
        case 0 => col("text")
        case 1 => reverse(col("text"))
        case _ => // rotate halves: length-preserving, kills cross-shard grams
          concat(
            col("text").substr(length(col("text")) / 2 + 1, length(col("text"))),
            col("text").substr(lit(1), length(col("text")) / 2))
      }
      df.select(band("doc_id", i), t.as("text"), col("lang"), col("source"),
        col("n_chars"))
    }
    emit("embeddings") { (df, i) =>
      val v = i % 3 match {
        case 0 => col("embedding")
        case 1 => transform(col("embedding"), x => -x)
        case _ => reverse(col("embedding"))
      }
      df.select(band("vec_id", i), v.as("embedding"), col("label"))
    }
    spark.stop()
  }
}
