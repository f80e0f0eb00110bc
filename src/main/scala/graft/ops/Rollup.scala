package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{AggregationMethod, RetentionPolicy}

/** The rollup/propagation step: whisper `__propagate`
  * (/root/reference/whisper.py:578-659) as a tumbling-window aggregation
  * with an xff HAVING clause.
  *
  * level-i is ALWAYS derivable as `propagate(level-(i-1))` — whisper keeps
  * the rings materialized and incrementally maintained; we do the same at
  * the storage layer (MetricStore) but the math lives here, once.
  */
object Rollup {

  /** One full rollup step: higher-resolution points → lower-resolution
    * consolidated points.
    *
    * @param higher   (metric, interval, value) at `higherStep` resolution
    * @return         (metric, interval, value) at `lowerStep` resolution;
    *                 windows failing the xff gate produce no row
    */
  def propagate(higher: DataFrame,
                higherStep: Int,
                lowerStep: Int,
                method: AggregationMethod,
                xff: Float): DataFrame = {
    require(lowerStep % higherStep == 0, s"$higherStep does not divide $lowerStep")
    val slots = lowerStep / higherStep
    higher
      .groupBy(col("metric"), Grid.align(col("interval"), lowerStep).as("interval"))
      .agg(
        Kernels.kernel(method, col("value"), col("interval"), lit(slots)).as("value"),
        count(col("value")).as("known"))
      .where(Kernels.xffGate(col("known"), lit(slots), xff))
      .select(col("metric"), col("interval"), col("value"))
  }

  /** Incremental variant: recompute ONLY the lower windows touched by a
    * change set — whisper's `uniqueLowerIntervals` incremental maintenance
    * (whisper.py:866-869). `changedIntervals` is a small (metric,
    * lower-interval) frame; broadcast it into a semi join so the big side
    * never reshuffles beyond the final groupBy.
    */
  def propagateTouched(higher: DataFrame,
                       changed: DataFrame,
                       higherStep: Int,
                       lowerStep: Int,
                       method: AggregationMethod,
                       xff: Float): DataFrame = {
    val touched = changed
      .select(col("metric"), Grid.align(col("interval"), lowerStep).as("interval"))
      .distinct()
    val scoped = higher
      .withColumn("lower_interval", Grid.align(col("interval"), lowerStep))
      .join(
        broadcast(touched.withColumnRenamed("interval", "lower_interval")),
        Seq("metric", "lower_interval"),
        "left_semi")
      .drop("lower_interval")
    propagate(scoped, higherStep, lowerStep, method, xff)
  }

  /** Materialize every level from level-0 points: the resize/backfill
    * path. Each level is computed from the previous (not from raw), exactly
    * like the archive cascade.
    */
  def cascade(level0: DataFrame, policy: RetentionPolicy): Seq[DataFrame] = {
    val steps = policy.levels.map(_.secondsPerPoint)
    steps.zipWithIndex.drop(1).scanLeft(level0) {
      case (prev, (step, i)) =>
        propagate(prev, steps(i - 1), step, policy.aggregation, policy.xff)
    }
  }
}
