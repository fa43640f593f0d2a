package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** M5 — Structured Streaming incremental materialization (SURVEY.md §2.8).
  *
  * The reference approximates online freshness by manually re-running a batch
  * job (reference: jobs/materialize_online.py) and re-reading parquet
  * (serving/app.py:93-96). The Spark-native upgrade is a streaming pipeline:
  * file source over bronze appends → event-time watermark → windowed
  * aggregation → `foreachBatch` upsert into the online store.
  *
  * Semantics by construction match the batch tumbling aggregation
  * (`tumblingAgg`): re-aggregation per micro-batch over watermarked state —
  * chosen over flatMapGroupsWithState per SURVEY §7.10 (simpler, and
  * batch/stream parity is testable, see StreamingSpec).
  */
object StreamingFeatures {

  /** Batch twin: per (event_type, hour bucket) counts and value sums.
    * Integer hour bucket (`ts_us DIV 3600000000`) rather than a window
    * struct, so the result is directly comparable engine-to-engine. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("hour_bucket", expr("ts_us DIV 3600000000"))
      .withColumn("vc", round(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
      .groupBy(col("event_type"), col("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("vc")) / lit(100.0)).as("value_sum"))

  /** Streaming variant of `tumblingAgg` from a file source. `eventsDir` must
    * be a DIRECTORY of events-schema parquet files (FileStreamSource rejects
    * bare files) — i.e. a bronze append directory; `complete` output into a
    * memory sink for tests, foreachBatch-upsert in production. */
  def streamTumblingAgg(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(schema)
      .parquet(eventsDir)
    val ev = raw
      .withColumn("ts_us", expr("ts DIV 1000L"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
    ev.withColumn("hour_bucket", expr("ts_us DIV 3600000000"))
      .withColumn("vc", round(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
      .groupBy(col("event_type"), col("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("vc")) / lit(100.0)).as("value_sum"))
  }

  /** Run the streaming agg to completion against a static events directory
    * (test support): memory sink, complete mode, synchronous drain. */
  def runToMemorySink(spark: SparkSession, eventsDir: String,
                      queryName: String): StreamingQuery = {
    val q = streamTumblingAgg(spark, eventsDir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
