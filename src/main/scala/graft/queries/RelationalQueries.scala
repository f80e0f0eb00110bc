package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.Io

/** Generic relational surface over the TPC-H-ish tables — exercises the
  * operator categories SURVEY.md §2.3 lists (joins, aggregation, window
  * functions, sorts/limits/top-k, semi/anti set ops) and feeds the bench.
  *
  * Cross-engine determinism for big double sums: per-row expressions are
  * exact-grid decimals (2dp·2dp products ≤ 6dp), so both engines cast to
  * DECIMAL, sum EXACTLY, then cast the total to DOUBLE — bit-identical
  * regardless of summation order. Pattern:
  *   Spark: sum(expr.cast("decimal(18,6)")).cast("double")
  *   DuckDB: CAST(sum(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)
  */
object RelationalQueries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String): DataFrame =
    Io.readTable(s, dir, name)

  /** epoch seconds for 1998-01-01T00:00:00Z — the Q1-style cutoff. */
  private val Cutoff = 883612800L

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.where(Io.tsBefore(li, "l_shipdate", Cutoff))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax"))).cast("decimal(18,6)")).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "count_order")
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    QueryDef(
      "q02_revenue_by_segment",
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)")).cast("double").as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    QueryDef(
      "q03_topk_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin
    ),

    QueryDef(
      "q04_window_rank",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("ts").asc, col("o_orderkey").asc)
        o.select(col("o_custkey"), col("o_orderkey"), Io.tsec(o, "o_orderdate").as("ts"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3 && col("o_custkey") < 100)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      """SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 AND o_custkey < 100
        |ORDER BY o_custkey, rn""".stripMargin
    ),

    QueryDef(
      "q05_semi_anti",
      // semi + anti in ONE lazy pass: left join against the distinct
      // order keys, then group by the exists flag — one shuffle of orders
      // (the distinct) + one broadcastable join, where the two-sided
      // semi/anti spelling runs two full joins as two eager driver jobs
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders").select("o_custkey").distinct()
        val grouped = c
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(when(col("o_custkey").isNull, "no_orders")
            .otherwise("with_orders").as("grp"))
          .groupBy("grp")
          .agg(count(lit(1)).as("n"))
        // a group the data doesn't produce must still report n=0 (the
        // oracle's UNION ALL shape): join the static group list back
        Seq("no_orders", "with_orders").toDF("grp")
          .join(grouped, Seq("grp"), "left")
          .select(col("grp"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("grp")
      },
      """SELECT 'no_orders' AS grp, count(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'with_orders', count(*) FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY grp""".stripMargin
    ),

    QueryDef(
      "q07_cube_counts",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin
    ),

    QueryDef(
      "q08_region_revenue",
      (s, dir) => {
        val r = t(s, dir, "region").select("r_regionkey", "r_name")
        val n = t(s, dir, "nation").select("n_nationkey", "n_regionkey")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy("r_name")
      },
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    QueryDef(
      "q09_running_sum",
      // window FRAME (rows unbounded preceding): per-customer running
      // order spend. Decimal-exact cumulative terms keep the running
      // totals bit-identical regardless of each engine's frame algorithm.
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
          .withColumn("running_spend", sum(col("p")).over(w).cast("double"))
          .where(col("o_custkey") < 50)
          .select("o_custkey", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ),

    QueryDef(
      "q06_brand_stats",
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_brand")
        val li = t(s, dir, "lineitem").select("l_partkey", "l_quantity")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .withColumn("avg_qty", col("sum_qty") / col("n"))
          .select("p_brand", "sum_qty", "avg_qty", "n")
          .orderBy("p_brand")
      },
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    )
  )
}
