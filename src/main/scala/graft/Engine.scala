package graft

import org.apache.spark.sql.SparkSession

import graft.functions.DotProduct
import graft.plans.RollupSubstitution
import graft.store.MetricStore

/** One-call installation of the engine into a SparkSession:
  *
  *   - `dot_product` registered as a SQL function (the custom codegen'd
  *     Catalyst expression, usable from spark.sql);
  *   - the RollupSubstitution optimizer rule bound to a store (window
  *     aggregates answered from maintained rollup levels);
  *   - the store's level and policy tables exposed as temp views.
  *
  * After `Engine.install(spark, store, "g")` a SQL user can run e.g.
  *   SELECT metric, interval - interval % 300 AS interval, avg(value) AS value
  *   FROM g_level_0 GROUP BY 1, 2
  * and have it served from the precomputed g_level_1 when semantics allow.
  */
object Engine {

  def registerFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")

  def install(spark: SparkSession, store: MetricStore, prefix: String): Unit = {
    registerFunctions(spark)
    RollupSubstitution.register(spark, store)
    store.registerViews(prefix)
  }
}
