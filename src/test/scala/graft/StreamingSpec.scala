package graft

import graft.streaming.StreamingFeatures

/** Batch/stream parity: the streaming tumbling aggregation over the events
  * file source must converge to exactly the batch twin's result (SURVEY §2.8
  * rebuild stance: re-aggregation per micro-batch matches batch semantics by
  * construction). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling agg equals batch tumbling agg") {
    // FileStreamSource wants a directory of appends; stage the fixture file
    // into one (the bronze-append layout).
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-000.parquet"))
    val q = StreamingFeatures.runToMemorySink(spark, dir.toString, "stream_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_out")
    val batch = StreamingFeatures.tumblingAgg(Tables.events(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    val joined = streamed
      .withColumnRenamed("n_events", "n2")
      .withColumnRenamed("value_sum", "v2")
      .join(batch, Seq("event_type", "hour_bucket"), "full")
    assert(joined.filter($"n_events".isNull || $"n2".isNull ||
      $"n_events" =!= $"n2" || $"value_sum" =!= $"v2").count() == 0)
  }
}
