package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.store.MetricStore

/** spark.sql.extensions wiring: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` and a conf-configured
  * store root substitutes rollup scans with no programmatic registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Now = 1706659200L

  test("conf-configured session substitutes; unset root is a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("ms-extensions").toString
    val store = new MetricStore(spark, root, numBuckets = 4)
    store.create("m",
      RetentionPolicy(Seq(ArchiveInfo(60, 300), ArchiveInfo(300, 300)), xff = 0f))
    val base = Now - 3000
    val w0 = base - base % 300
    val pts = (0 until 10).map(i => ("m", w0 + i * 60L, 10.0 + i, i.toLong))
    store.updateMany(pts.toDF("metric", "ts", "value", "seq"), Now)

    // fresh session on the SAME SparkContext. withExtensions stands in
    // for `--conf spark.sql.extensions=graft.GraftExtensions`: that key
    // is STATIC (read from the SparkContext conf at first-session build),
    // so it cannot be injected onto a shared test context — the
    // conf-string path is Spark's own loadExtensions plumbing; what's
    // ours to test is the GraftExtensions injector + conf-driven rule.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config(GraftExtensions.RootKey, root)
      .config(GraftExtensions.BucketsKey, "4")
      .getOrCreate()
    try {
      def query(s: SparkSession) = {
        val st = new MetricStore(s, root, numBuckets = 4)
        st.levelData(0)
          .select("metric", "interval", "value")
          .groupBy(col("metric"),
            (col("interval") - col("interval") % lit(300L)).as("interval"))
          .agg(avg(col("value")).as("value"))
      }
      def hasAggregate(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty

      val q = query(s2)
      assert(!hasAggregate(q),
        s"extension rule did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got == Map(w0 -> 12.0, (w0 + 300) -> 17.0))

      // same session, root conf removed → rule no-ops, plain aggregation
      s2.conf.unset(GraftExtensions.RootKey)
      val q2 = query(s2)
      assert(hasAggregate(q2), "rule should no-op without a configured root")
      val got2 = q2.orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got2 == got) // and results agree either way

      // malformed buckets conf must degrade (default 8 ≠ store's 4 →
      // bucket mismatch disables nothing here since the rule reads its
      // own store; the key point is NO NumberFormatException out of the
      // optimizer — every query on the session would fail)
      s2.conf.set(GraftExtensions.RootKey, root)
      s2.conf.set(GraftExtensions.BucketsKey, "64k")
      val q3 = query(s2)
      val got3 = q3.orderBy("interval").collect()
        .map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value")).toMap
      assert(got3 == got) // still answers, correctly
      s2.conf.set(GraftExtensions.BucketsKey, "4")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
