package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.AggregationMethod
import graft.model.AggregationMethod._

/** Spark Column expressions for the 8 whisper consolidation kernels
  * (/root/reference/whisper.py:553-575). All are built-in Catalyst
  * aggregates (codegen'd, partial-aggregation capable) — no UDAFs.
  *
  * Determinism notes (the reference consolidates values in chronological
  * slot order, so ties must break toward the earliest interval):
  *   - `last`  = chronologically last known value → max_by(value, interval)
  *   - `absmax`/`absmin` keep the sign and, on |v| ties, the reference's
  *     Python max/min(key=abs) keeps the FIRST (earliest) value → order by
  *     (|v|, -interval) lexicographically via struct comparison.
  *   - `avg_zero` divides by the window's slot CAPACITY, not the known
  *     count (whisper.py:563-568) — hence the `slots` argument.
  */
object Kernels {

  /** Aggregate expression for one consolidation window.
    *
    * @param value    the point value column
    * @param interval the point's grid interval (epoch seconds) — ordering key
    * @param slots    number of higher-resolution slots a window spans
    *                 (lowerStep / higherStep), as a literal-bearing Column
    */
  def kernel(method: AggregationMethod,
             value: Column,
             interval: Column,
             slots: Column): Column = method match {
    case Average => avg(value)
    case Sum     => sum(value)
    case Last    => max_by(value, interval)
    case Max     => max(value)
    case Min     => min(value)
    // sum over known values == sum over all slots with empty→0
    case AvgZero => sum(value) / slots
    case AbsMax  => max_by(value, struct(abs(value), -interval))
    case AbsMin  => min_by(value, struct(abs(value), interval))
  }

  /** The xff gate (whisper.py:634-641): a consolidation window produces a
    * value iff knownFraction >= xFilesFactor AND at least one value is
    * known (the known>0 check precedes the xff comparison in the
    * reference, so xff=0 still requires one known point).
    */
  def xffGate(knownCount: Column, slots: Column, xff: Float): Column =
    knownCount > 0 && (knownCount.cast("double") / slots.cast("double")) >= lit(xff.toDouble)
}
