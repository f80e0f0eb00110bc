package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.plans.RollupSubstitution
import graft.store.MetricStore

/** Session-extension entry point — the idiomatic, zero-code way to enable
  * graft's optimizer rules on any session:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions \
  *                --conf spark.graft.store.root=/data/metrics \
  *                [--conf spark.graft.store.buckets=64]
  * }}}
  *
  * The injected rule resolves the MetricStore from runtime conf at
  * optimization time, so the store root may be set (or changed) after
  * session start; with no root configured the rule is a no-op. For
  * programmatic wiring on an already-built session, use
  * [[graft.plans.RollupSubstitution.register]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => new ConfiguredRollupSubstitution(session))
}

object GraftExtensions {
  val RootKey = "spark.graft.store.root"
  val BucketsKey = "spark.graft.store.buckets"
}

/** Conf-driven wrapper around [[RollupSubstitution]]: reads the store
  * root/buckets from the session conf on each optimizer run, memoizing
  * the wired rule per configuration.
  */
private[graft] final class ConfiguredRollupSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  @volatile private var cached: Option[(String, Int, RollupSubstitution)] = None

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(GraftExtensions.RootKey) match {
      case None => plan
      case Some(root) =>
        // A malformed conf value must degrade to the default (with a
        // warning), not throw NumberFormatException out of the
        // optimizer and fail every query on the session.
        val buckets = spark.conf.getOption(GraftExtensions.BucketsKey) match {
          case None => 8
          case Some(b) =>
            scala.util.Try(b.trim.toInt).toOption.filter(_ > 0).getOrElse {
              logWarning(
                s"ignoring malformed ${GraftExtensions.BucketsKey}='$b'; using 8")
              8
            }
        }
        val rule = cached match {
          case Some((r, b, ru)) if r == root && b == buckets => ru
          case _ =>
            val ru = RollupSubstitution(spark, new MetricStore(spark, root, buckets))
            cached = Some((root, buckets, ru))
            ru
        }
        rule(plan)
    }
}
