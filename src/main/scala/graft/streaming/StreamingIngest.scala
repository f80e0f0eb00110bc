package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.model.{AggregationMethod, RetentionPolicy}
import graft.ops.Kernels
import graft.store.MetricStore

/** Streaming write path. Whisper has no streaming engine in-repo (carbon
  * is the sibling writer), but its update semantics DEFINE the streaming
  * contract (SURVEY.md §2.3): late data accepted within maxRetention
  * (watermark), last-write-wins on duplicate slots, tumbling-window
  * rollups continuously maintained.
  *
  * Two modes:
  *   - `start`: micro-batch upsert into a MetricStore via foreachBatch —
  *     each batch runs the full update_many path (routing, LWW, cascade),
  *     so batch and streaming ingest share one code path;
  *   - `rollupStream`: pure Structured Streaming tumbling-window
  *     aggregation with watermark + xff gate, for pipelines that sink
  *     rollups elsewhere. State stays bounded: tumbling windows only
  *     (whisper has no sliding/session windows) and the watermark caps
  *     retained state.
  */
object StreamingIngest {

  /** Micro-batch upsert into a store. `stream` columns:
    * (metric: string, ts: timestamp, value: double, seq: long).
    */
  def start(stream: DataFrame, store: MetricStore, checkpoint: String,
            now: () => Long): StreamingQuery =
    stream
      .select(col("metric"), col("ts").cast("long").as("ts"), col("value"), col("seq"))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.updateMany(batch, now())
      }
      .start()

  /** Continuous tumbling-window rollup: the streaming form of
    * Rollup.propagate. Watermark = allowed lateness (whisper's
    * maxRetention acceptance window, capped for bounded state —
    * SURVEY.md §7.4: very late data goes through the batch path).
    *
    * @param points streaming frame (metric, ts: timestamp, value)
    * @param sourceStep seconds per point of the incoming stream's grid
    */
  def rollupStream(points: DataFrame, sourceStep: Int, step: Int,
                   method: AggregationMethod, xff: Float,
                   maxLatenessSec: Long): DataFrame = {
    val slots = step / sourceStep
    points
      .withWatermark("ts", s"$maxLatenessSec seconds")
      .groupBy(window(col("ts"), s"$step seconds"), col("metric"))
      .agg(
        Kernels.kernel(method, col("value"), col("ts").cast("long"), lit(slots)).as("value"),
        count(col("value")).as("known"))
      .where(Kernels.xffGate(col("known"), lit(slots), xff))
      .select(
        col("metric"),
        col("window.start").cast("long").as("interval"),
        col("value"))
  }

  /** Streaming exact dedup for the training-data pipeline: drop documents
    * whose canonical fingerprint was already seen, with state bounded by
    * a watermark (a duplicate arriving later than `maxLatenessSec` after
    * its original passes through — the batch dedup sweep catches those).
    *
    * @param docs streaming frame with (ts: timestamp, text: string, ...)
    */
  def dedupStream(docs: DataFrame, maxLatenessSec: Long): DataFrame =
    docs
      .withColumn("fp", graft.ext.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", s"$maxLatenessSec seconds")
      .dropDuplicates("fp")
      .drop("fp")

  /** Convenience: stream rollups for every level of a policy (each level
    * its own query; level i aggregates the raw stream at level-i
    * granularity — streaming recompute, not cascade, so each window is
    * exact over the raw points it has seen).
    */
  def rollupStreams(points: DataFrame, policy: RetentionPolicy,
                    maxLatenessSec: Long): Seq[DataFrame] =
    policy.levels.map { lvl =>
      rollupStream(points, policy.levels.head.secondsPerPoint,
        lvl.secondsPerPoint, policy.aggregation, policy.xff, maxLatenessSec)
    }
}
