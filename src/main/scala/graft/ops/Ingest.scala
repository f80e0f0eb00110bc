package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.RetentionPolicy

/** The batch write path: whisper `update_many` semantics
  * (/root/reference/whisper.py:740-875) re-expressed as declarative
  * DataFrame transforms.
  *
  * Semantics reproduced:
  *   - each point lands in the HIGHEST-precision level whose retention
  *     covers its age (whisper.py:767-784);
  *   - points older than total retention are silently dropped
  *     (whisper.py:781-782); future points (age<0) land in level 0 —
  *     update_many does NOT reject them (contrast file_update:693-696);
  *   - within a level, same-interval duplicates collapse to the point the
  *     reference's ring write leaves standing (whisper.py:748,806-808 plus
  *     the full-list reverse at 770/788): points are sorted by timestamp
  *     (descending, STABLE) and then reversed, so the run of duplicates is
  *     ascending-by-ts with equal-ts points in REVERSED listed order, and
  *     "take last in run" keeps the MAX-timestamp point, first-LISTED on
  *     exact timestamp ties. The LWW key is therefore (ts asc, seq desc),
  *     NOT plain arrival order — verified against the executing reference
  *     by [[graft.tools.DiffFuzz]] (arrival-order max_by diverged on
  *     same-interval duplicates).
  */
object Ingest {

  /** Level-routing expression: index of the finest level whose retention
    * covers `age`, else null (dropped). A static when-chain — fully
    * codegen'd, no shuffle.
    */
  def levelFor(age: Column, policy: RetentionPolicy): Column =
    policy.levels.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((lvl, i), elseExpr) => when(age <= lit(lvl.retention), lit(i)).otherwise(elseExpr)
    }

  /** Route a raw batch to levels and collapse to last-write-wins points.
    *
    * @param batch columns (metric: string, ts: long epoch-sec,
    *              value: double, seq: long arrival order)
    * @param now   reference "now" in epoch seconds
    * @return columns (metric, level: int, interval: long, value: double)
    *         — one row per (metric, level, interval), LWW-resolved
    */
  def routeAndDedup(batch: DataFrame, policy: RetentionPolicy, now: Long): DataFrame = {
    val stepForLevel: Column =
      policy.levels.zipWithIndex.foldRight(lit(null).cast("long")) {
        case ((lvl, i), elseExpr) =>
          when(col("level") === i, lit(lvl.secondsPerPoint.toLong)).otherwise(elseExpr)
      }
    batch
      // a null-valued point is a GAP, not a datum: whisper's update can
      // only write floats (whisper.py:693,740) — an unwritten slot is the
      // only "null". Dropping BEFORE the LWW collapse means a null last
      // write leaves the earlier real point standing (the null write
      // never existed), and level 0 never stores null values — the
      // invariant the substitution rewrites' count(value) == count(*)
      // equations and the all-null-window xff gate rely on.
      .where(col("value").isNotNull)
      .withColumn("level", levelFor(lit(now) - col("ts"), policy))
      .where(col("level").isNotNull)
      .withColumn("interval", Grid.align(col("ts"), stepForLevel))
      // Winner per slot: max timestamp, then FIRST-listed on ts ties
      // (see scaladoc) — struct ordering gives the lexicographic
      // (ts asc, -seq asc) max. One shuffle, with map-side partial
      // aggregation.
      .groupBy(col("metric"), col("level"), col("interval"))
      .agg(max_by(col("value"), struct(col("ts"), (-col("seq")).as("negseq")))
        .as("value"))
  }
}
