package graft.streaming

import graft.icelite.IceLiteTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Structured-Streaming front for the engine (SURVEY.md §2.10/§7.7 — the
  * reference itself has no streaming code; this is the labeled stretch:
  * the streaming ingestion path a lakehouse deployment runs, e.g.
  * Flink/Spark → Iceberg mentioned at README.md:832).
  *
  * Two composable pieces:
  *  - windowed event aggregation with watermarked late-data handling
  *  - exactly-once-per-batch append into an IceLite table via foreachBatch
  *    (each micro-batch becomes one atomic IceLite snapshot, giving the
  *    same commit semantics as Iceberg streaming writes)
  */
object StreamingIngest {

  /** Tumbling-window count/sum per event_type with a watermark bounding
    * state. Input must carry (ts TIMESTAMP, event_type STRING, value
    * DOUBLE). */
  def windowedEventAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Stream → IceLite: every micro-batch appends as one snapshot. Restart
    * safety comes from the checkpoint (Spark replays uncommitted batches;
    * IceLite appends are atomic per batch). */
  def writeToIceLite(stream: DataFrame, table: IceLiteTable,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) table.append(batch)
      }
}
