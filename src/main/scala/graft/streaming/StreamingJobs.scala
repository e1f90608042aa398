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
