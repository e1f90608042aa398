package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sinks.Sinks

/** Structured Streaming formulation of the reference's micro-batch
  * ingestion (SURVEY §2.9: the hourly weather cron + keyed MERGE is
  * streaming-shaped work). Not required for parity — the reference has
  * no streams — but the natural Spark evolution: a stream of
  * category/observation rows continuously upserted into the daily
  * table, with watermarked windowed aggregation for derived stats.
  */
object StreamingJobs {

  /** Watermarked tumbling-window aggregation over an event stream
    * (events -> per-window, per-type counts and sums). */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Custom keyed state across micro-batches (SURVEY §2.9 /
    * KeyValueGroupedDataset.mapGroupsWithState): per-key running
    * aggregates that survive batch boundaries — the building block
    * for sessionization / dedup-across-batches at 100 TB stream
    * scale. Emits (key, events_in_batch, events_total) per batch. */
  def runningCounts(events: org.apache.spark.sql.Dataset[(Long, Double)]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = rows.size.toLong
          val total = state.getOption.getOrElse(0L) + n
          state.update(total)
          (key, n, total)
      }
      .toDF("user_id", "n_batch", "n_total")
  }

  /** Streaming exact dedup (the corpus dedup family's stream face):
    * drop re-ingested duplicates by content key across micro-batches,
    * bounded by a watermark so the dedup state is evictable — the
    * only shape that survives an unbounded 100 TB/day ingest (state
    * holds one key per document seen inside the watermark horizon,
    * not the corpus). */
  def dedupStream(docs: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session windows (gap-close sessionization) over an event stream:
    * the watermarked session_window aggregation — Spark's native
    * answer to the reference's per-sow event-run grouping, applied to
    * the event stream. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Micro-batch keyed upsert: every batch MERGEs into the parquet
    * target on `keys` (the weather MERGE, weather.py:1697-1732, as a
    * stream). foreachBatch is the batch-engine bridge — on Delta this
    * body becomes a single MERGE INTO statement. */
  def upsertStream(stream: DataFrame, keys: Seq[String], targetPath: String,
                   checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertParquet(batch.sparkSession, batch, targetPath, keys)
      }
      .start()
}
