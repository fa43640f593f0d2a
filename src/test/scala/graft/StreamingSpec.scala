package graft

import graft.streaming.StreamingFeatures

/** Batch/stream parity: the streaming tumbling aggregation over the events
  * file source must converge to exactly the batch twin's result (SURVEY §2.8
  * rebuild stance: re-aggregation per micro-batch matches batch semantics by
  * construction). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def stageEventsDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-000.parquet"))
    dir.toString
  }

  test("incremental online materialization converges to the batch store") {
    import graft.store.{FeatureStore, KvSink}
    KvSink.InMemoryKvClient.clear()
    val q = graft.streaming.StreamingFeatures.streamOnlineMaterialize(
      spark, stageEventsDir(), () => new KvSink.InMemoryKvClient)
    q.processAllAvailable(); q.stop()
    val streamed = KvSink.InMemoryKvClient.snapshot

    val gold = FeatureStore.buildGold(spark, sf)
    KvSink.InMemoryKvClient.clear()
    KvSink.materializeOnline(FeatureStore.latestSnapshots(gold),
      () => new KvSink.InMemoryKvClient)
    val batch = KvSink.InMemoryKvClient.snapshot

    assert(streamed.keySet == batch.keySet && streamed.nonEmpty)
    streamed.foreach { case (k, fields) => assert(fields == batch(k), k) }
  }

  test("flatMapGroupsWithState sessionization closes exactly the batch sessions") {
    import org.apache.spark.sql.streaming.Trigger
    val gapUs = 30 * 60 * 1000000L
    val sessions = StreamingFeatures.streamSessionize(spark, stageEventsDir(), gapUs)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_sessions")
      .select($"user_id", $"t_start_us", $"t_end_us", $"n_events", $"value_cents")
    val batch = graft.ops.Sessions.sessionize(Tables.events(spark, sf), gapUs)
      .withColumn("value_cents", round($"value_sum" * 100).cast("long"))
    val batchAll = batch
      .select($"user_id", $"t_start_us", $"t_end_us", $"n_events", $"value_cents")
    val lastPerUser = batch.groupBy($"user_id")
      .agg(max($"session_id").as("session_id"))
    // sessions closed by a later in-batch event MUST all be emitted
    val inBatchClosed = batch.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select($"user_id", $"t_start_us", $"t_end_us", $"n_events", $"value_cents")
    assert(streamed.count() > 0)
    // everything emitted is a genuine batch session, byte-for-byte
    assert(streamed.except(batchAll).count() == 0)
    assert(inBatchClosed.except(streamed).count() == 0)
    // the remainder comes from the event-time timeout in AvailableNow's
    // final batch: trailing sessions already past watermark = maxTs - 1h
    val maxTsUs = Tables.events(spark, sf).agg(max($"ts_us")).first().getLong(0)
    val extras = streamed.except(inBatchClosed)
    assert(extras.except(batchAll.join(
      lastPerUser.join(batch, Seq("user_id", "session_id"))
        .select($"user_id", $"t_start_us"), Seq("user_id", "t_start_us"))).count() == 0)
    assert(extras.filter($"t_end_us" + gapUs > maxTsUs - 3600000000L).count() == 0)
  }

  test("mapGroupsWithState running totals equal batch aggregation") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val totals = graft.streaming.StreamingFeatures
      .statefulUserTotals(spark, stageEventsDir())
    val q = totals.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("user_totals")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // Update mode: keep each user's LAST emitted row (max n_events)
    val streamed = spark.table("user_totals")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"spend_cents", $"last_ts_us")).as("s"))
      .select($"user_id", $"s.n_events", $"s.spend_cents", $"s.last_ts_us")
    val batch = Tables.events(spark, sf)
      .withColumn("cents",
        when($"event_type" =!= "error",
          round(coalesce($"value", lit(0.0)) * 100).cast("long")).otherwise(0L))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("spend_cents"),
        max($"ts_us").as("last_ts_us"))
    assert(streamed.join(batch, Seq("user_id"), "full")
      .filter(streamed("n_events") =!= batch("n_events") ||
        streamed("spend_cents") =!= batch("spend_cents") ||
        streamed("last_ts_us") =!= batch("last_ts_us")).count() == 0)
    assert(streamed.count() == batch.count() && batch.count() > 0)
  }

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

  test("streaming sliding agg equals batch sliding agg") {
    import org.apache.spark.sql.streaming.Trigger
    val q = StreamingFeatures.streamSlidingAgg(spark, stageEventsDir())
      .writeStream.outputMode("complete").format("memory")
      .queryName("sliding_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sliding_out")
    val batch = StreamingFeatures.slidingAgg(Tables.events(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    val joined = streamed
      .withColumnRenamed("n_events", "n2")
      .withColumnRenamed("value_sum", "v2")
      .join(batch, Seq("event_type", "window_start_us"), "full")
    assert(joined.filter($"n_events".isNull || $"n2".isNull ||
      $"n_events" =!= $"n2" || $"value_sum" =!= $"v2").count() == 0)
  }

  test("stream-stream interval join equals the batch range join (matched pairs)") {
    import org.apache.spark.sql.streaming.Trigger
    val q = StreamingFeatures.streamStreamClicksBeforePurchase(spark, stageEventsDir())
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_out")
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts_us".as("c_ts"))
    val batch = p.join(c,
      $"user_id" === $"c_user" &&
        $"c_ts" >= $"ts_us" - 3600000000L && $"c_ts" < $"ts_us")
      .select($"user_id", $"event_id", $"ts_us", $"c_ts")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("stream-stream LEFT OUTER join: matched rows equal batch; null rows " +
    "are exactly the watermark-expired unmatched purchases") {
    import org.apache.spark.sql.streaming.Trigger
    val q = StreamingFeatures.streamStreamLeftOuterClicks(spark, stageEventsDir())
      .writeStream.outputMode("append").format("memory")
      .queryName("ssloj_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssloj_out")
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts_us".as("c_ts"))
    val batchInner = p.join(c,
      $"user_id" === $"c_user" &&
        $"c_ts" >= $"ts_us" - 3600000000L && $"c_ts" < $"ts_us")
      .select($"user_id", $"event_id", $"ts_us", $"c_ts")
    // matched pairs: identical to the batch inner join
    val sMatched = streamed.filter($"c_ts".isNotNull)
    assert(sMatched.count() == batchInner.count() && batchInner.count() > 0)
    assert(sMatched.except(batchInner).count() == 0 &&
      batchInner.except(sMatched).count() == 0)
    // null-extended rows: a subset of the batch-unmatched purchases…
    val batchUnmatched = p.join(c,
      $"user_id" === $"c_user" &&
        $"c_ts" >= $"ts_us" - 3600000000L && $"c_ts" < $"ts_us",
      "left_anti")
    val sNull = streamed.filter($"c_ts".isNull)
      .select($"user_id", $"event_id", $"ts_us")
    assert(sNull.count() > 0, "outer join emitted no null rows")
    assert(sNull.except(batchUnmatched).count() == 0,
      "a null row for a purchase that HAS matching clicks")
    // …and complete for purchases safely past the final GLOBAL watermark —
    // min over the two inputs, each computed from ITS OWN max event time
    // (purchases −1 h, clicks −2 h), not the whole table's. Watermarks are
    // millisecond-truncated — 1 s of slack keeps boundary rows out.
    val maxP = p.agg(max($"ts_us")).head().getLong(0)
    val maxC = c.agg(max($"c_ts")).head().getLong(0)
    val wm = math.min(maxP - 3600000000L, maxC - 2 * 3600000000L)
    val safe = batchUnmatched.filter($"ts_us" < wm - 1000000L)
    assert(safe.except(sNull).count() == 0,
      "watermark-expired unmatched purchase missing its null row")
  }

  test("multi-micro-batch replay equals batch (time-ordered appends)") {
    // bronze-append replay: the fixture split into 4 time-ordered chunk
    // files, fed one file per micro-batch (maxFilesPerTrigger=1), so the
    // watermarked aggregation accumulates across batches instead of seeing
    // everything at once — the actual production shape of incremental
    // materialization
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_replay")
    (1 to 4).foreach { k =>
      val tmp = Files.createTempDirectory(s"chunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(part.toPath, dst)
      // FileStreamSource orders the initial backlog by mod time: pin
      // strictly increasing stamps so batch k really is time-chunk k
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val q = StreamingFeatures.runToMemorySink(spark, dir.toString,
      "replay_out", maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      s"expected >=4 micro-batches, got ${q.recentProgress.length}")
    val streamed = spark.table("replay_out")
    val batch = StreamingFeatures.tumblingAgg(Tables.events(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    val joined = streamed
      .withColumnRenamed("n_events", "n2").withColumnRenamed("value_sum", "v2")
      .join(batch, Seq("event_type", "hour_bucket"), "full")
    assert(joined.filter($"n_events".isNull || $"n2".isNull ||
      $"n_events" =!= $"n2" || $"value_sum" =!= $"v2").count() == 0)
  }

  test("incremental sketch upsert: exact weekly distincts across batches; replays absorbed") {
    // two time-ordered halves, the SECOND delivered twice (at-least-once
    // replay): the stored bitmap sketches must still give exact per-week
    // distinct user counts — OR-merge is idempotent, so duplicate delivery
    // is absorbed without any dedup state
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_sketch_replay")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"skchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    Seq((chunkFiles(0), 1), (chunkFiles(1), 2), (chunkFiles(1), 3)).foreach {
      case (src, k) =>
        val dst = dir.resolve(f"chunk-$k%03d.parquet")
        Files.copy(src, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val store = Files.createTempDirectory("sketch_store").toString + "/weekly"
    val q = StreamingFeatures.streamSketchUpsert(spark, dir.toString, store,
      maxFilesPerTrigger = 1)
    q.processAllAvailable(); q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    val got = spark.read.parquet(store)
      .select($"week".cast("long").as("week"),
        graft.functions.GraftFunctions.bitmapCount($"sk").as("n"))
    val expected = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"user_id")
      .groupBy($"week").agg(countDistinct($"user_id").as("n2"))
    val j = got.join(expected, Seq("week"), "full")
    assert(j.filter($"n".isNull || $"n2".isNull || $"n" =!= $"n2").count() == 0)
    assert(got.count() > 0)
  }

  test("sketch materialization restart: checkpoint resumes at the first " +
    "unprocessed file; a lost checkpoint replays the backlog and the " +
    "store still converges (OR idempotency exercised across restarts)") {
    // crash/deploy simulation for streamSketchUpsert: run over half the
    // backlog, stop (kill), append the second half, restart with the SAME
    // checkpoint — offsets must skip chunk 1 and the final store must equal
    // the uninterrupted run's. Then the at-least-once worst case: restart
    // with a FRESH checkpoint (checkpoint lost), which reprocesses the
    // whole backlog — the stored bitmaps must be unchanged, because OR
    // absorbs the replayed user ids (the idempotency the scaladoc asserts,
    // here exercised across a real restart instead of argued).
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_sketch_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"srchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val chunkRows = chunkFiles.map(p => spark.read.parquet(p.toString).count())
    val ckpt = Files.createTempDirectory("sketch_ckpt").toString
    val store = Files.createTempDirectory("sketch_store_restart").toString + "/weekly"

    def storeCounts(): Map[Long, Long] =
      spark.read.parquet(store)
        .select($"week".cast("long").as("week"),
          graft.functions.GraftFunctions.bitmapCount($"sk").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    stage(1)
    val run1 = StreamingFeatures.streamSketchUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    assert(run1.recentProgress.map(_.numInputRows).sum == chunkRows(0))

    stage(2) // backlog grows while the query is down
    val run2 = StreamingFeatures.streamSketchUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    // offset recovery: ONLY the new file is read after the restart
    assert(run2.recentProgress.map(_.numInputRows).sum == chunkRows(1),
      s"restart must resume after chunk 1: ${run2.recentProgress.map(_.numInputRows).toSeq}")

    val expected = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"user_id")
      .groupBy($"week").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val afterRestart = storeCounts()
    assert(afterRestart == expected,
      "store after checkpointed restart must equal the uninterrupted run")

    // checkpoint LOSS: a fresh checkpoint reprocesses the full backlog;
    // the merged store must be bit-for-bit the same counts (OR idempotency)
    val ckpt2 = Files.createTempDirectory("sketch_ckpt_lost").toString
    val run3 = StreamingFeatures.streamSketchUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(run3.recentProgress.map(_.numInputRows).sum == chunkRows.sum,
      "a lost checkpoint must replay the whole backlog")
    assert(storeCounts() == expected,
      "replayed backlog must be absorbed: bitmap OR is idempotent")

    // idle restart with the surviving checkpoint: nothing new → zero rows
    val run4 = StreamingFeatures.streamSketchUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run4.processAllAvailable(); run4.stop()
    assert(run4.recentProgress.map(_.numInputRows).sum == 0)
  }

  test("KLL materialization restart: checkpointed resume stays exact; a " +
    "lost checkpoint's replay is REFUSED by the per-week batch_id guard " +
    "(store unchanged, pinned as the documented recovery contract)") {
    // the order-statistics sibling of the bitmap restart test, with the
    // OPPOSITE delivery contract: bitmap OR absorbs replays, KLL merge
    // does not (items carry weight), so the sink carries a per-week
    // batch_id high-water mark. Happy path: checkpointed restart reads
    // only the new file and the store's per-week weights and quantiles
    // are exact. Failure path: a lost checkpoint replays the backlog
    // through batchIds 0..k which the stored high-water marks dominate —
    // the replay is dropped week-by-week and the store stays EXACT (it
    // used to double before r11's idempotence guard; recovery from
    // checkpoint loss is now documented as delete-store-and-rebuild,
    // because new files landing in those low batchIds would be refused
    // too). Asserted here so the contract is executed, not argued.
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_kll_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"kllchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val chunkRows = chunkFiles.map(p => spark.read.parquet(p.toString).count())
    val ckpt = Files.createTempDirectory("kll_ckpt").toString
    val store = Files.createTempDirectory("kll_store").toString + "/weekly"

    def storeN(): Map[Long, Long] =
      spark.read.parquet(store)
        .select($"week".cast("long").as("week"),
          graft.functions.GraftFunctions.kllBlobN($"sk").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    stage(1)
    val run1 = StreamingFeatures.streamKllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    assert(run1.recentProgress.map(_.numInputRows).sum == chunkRows(0))

    stage(2) // backlog grows while the query is down
    val run2 = StreamingFeatures.streamKllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    assert(run2.recentProgress.map(_.numInputRows).sum == chunkRows(1),
      s"restart must resume after chunk 1: ${run2.recentProgress.map(_.numInputRows).toSeq}")

    // weight conservation: per-week n equals the exact event count
    val exactN = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"value")
      .groupBy($"week").agg(count($"value").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storeN() == exactN,
      "per-week sketch weight must equal the exact count after a " +
        "checkpointed restart")

    // quantile accuracy: the q295 rank gate per (week, quantile) — each
    // estimate's feasible rank interval must intersect [q-2%, q+2%] of the
    // week's exact ranks (per-week n is a few hundred at the spec fixture,
    // barely past K=256, so at most one compaction fires and the true
    // error is ~1/n — well inside the gate)
    val qs = graft.functions.KllCodec.Quantiles
    val got = spark.read.parquet(store)
      .select($"week".cast("long").as("week"),
        graft.functions.GraftFunctions.kllBlobQuantiles($"sk").as("est"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byWeek = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"value")
      .collect().groupBy(_.getLong(0))
      .map { case (w, rs) => w -> rs.map(_.getDouble(1)).sorted }
    byWeek.foreach { case (w, vals) =>
      val n = vals.length.toDouble
      qs.zipWithIndex.foreach { case (q, i) =>
        val e = got(w)(i)
        val rankLt = vals.count(_ < e) / n
        val rankLe = vals.count(_ <= e) / n
        assert(rankLe >= q - 0.02 && rankLt <= q + 0.02,
          s"week $w q=$q est=$e rank=[$rankLt,$rankLe]")
      }
    }

    // checkpoint LOSS: the fresh checkpoint replays the backlog through
    // batchIds 0 and 1, but every touched week's stored batch_id is >= the
    // replayed one — the guard refuses each partial and the store is
    // bit-unchanged (before the r11 guard this doubled every weight)
    val ckpt2 = Files.createTempDirectory("kll_ckpt_lost").toString
    val run3 = StreamingFeatures.streamKllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(run3.recentProgress.map(_.numInputRows).sum == chunkRows.sum)
    assert(storeN() == exactN,
      "a replayed backlog must be REFUSED by the per-week batch_id " +
        "high-water mark — a doubled weight means the guard lost the race")
  }

  test("HLL materialization restart: the register store equals a one-pass " +
    "batch build after chunked ingest, restart, AND checkpoint loss " +
    "(max-merge absorbs replays by algebra)") {
    // the approximate-distinct member, with the OPPOSITE delivery algebra
    // to KLL/CMS: registers merge by max, so replays are absorbed with no
    // batch_id guard — asserted by the strongest possible check: after
    // any ingest sequence the store must BIT-EQUAL the register table
    // built from the raw events in one batch pass.
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_hll_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"hllchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(3000000L + k * 60000L))
    }
    val ckpt = Files.createTempDirectory("hll_ckpt").toString
    val store = Files.createTempDirectory("hll_store").toString + "/weekly"
    def storeRegs(): Set[(Long, Long, Long)] =
      spark.read.parquet(store)
        .select($"week".cast("long"), $"j".cast("long"), $"m_j".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the one-pass truth over ALL events
    val h = graft.ext.Dedup.contentId($"user_id".cast("string"))
    val truth = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        (h % 256L).as("j"),
        (h.cast("long") / lit(256L)).cast("long").as("w"))
      .select($"week", $"j",
        when($"w" === 0L, lit(41L))
          .otherwise(lit(41L) - length(bin($"w")).cast("long")).as("m_j"))
      .groupBy($"week", $"j").agg(max($"m_j").as("m_j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    stage(1)
    val run1 = StreamingFeatures.streamHllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamHllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    assert(storeRegs() == truth,
      "incremental register store must equal the one-pass batch build")

    // checkpoint LOSS: the replay re-maxes the same registers — absorbed
    val ckpt2 = Files.createTempDirectory("hll_ckpt_lost").toString
    val run3 = StreamingFeatures.streamHllUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(storeRegs() == truth,
      "a replayed backlog must be absorbed: register max is idempotent")
  }

  test("minhash materialization restart (r12): the signature store equals " +
    "a one-pass batch build after chunked ingest, restart, AND checkpoint " +
    "loss (slot min absorbs replays by algebra); adjacent-week Jaccard " +
    "estimates reproduce the q439 slot-agreement arithmetic") {
    // the set-similarity member of the streaming sketch face, same
    // delivery algebra as bitmap OR / HLL max / theta union: each slot is
    // a MIN over the week's user hashes — a pure function of the value
    // set, so any replay or re-chunking converges to the identical store.
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    import graft.ext.Dedup
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_minhash_restart")
    val chunkFiles = (1 to 2).map { n =>
      val tmp = Files.createTempDirectory(s"mhchunk_$n")
      chunked.filter($"c" === n).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(n: Int): Unit = {
      val dst = dir.resolve(f"chunk-$n%03d.parquet")
      Files.copy(chunkFiles(n - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(5000000L + n * 60000L))
    }
    val ckpt = Files.createTempDirectory("minhash_ckpt").toString
    val store = Files.createTempDirectory("minhash_store").toString + "/weekly"
    def storeRows(): Set[(Long, Long, Long)] =
      spark.read.parquet(store)
        .select($"week".cast("long"), $"j".cast("long"), $"minh".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // one-pass truth: per-week per-permutation minima over ALL events
    val h = Dedup.contentId($"user_id".cast("string"))
    val truth = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        h.cast("long").as("hv"))
      .select($"week", posexplode(array((0 until Dedup.NumHashes).map(j =>
        (lit(Dedup.hashA(j)) * $"hv" + lit(Dedup.hashB(j))) %
          lit(Dedup.P)): _*)))
      .select($"week", $"pos".cast("long").as("j"), $"col".as("mh"))
      .groupBy($"week", $"j").agg(min($"mh").as("minh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    stage(1)
    val run1 = StreamingFeatures.streamMinhashUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamMinhashUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    assert(storeRows() == truth,
      "incremental signature store must equal the one-pass batch build")

    // checkpoint LOSS: the replay re-mins the same slots — absorbed
    val ckpt2 = Files.createTempDirectory("minhash_ckpt_lost").toString
    val run3 = StreamingFeatures.streamMinhashUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(storeRows() == truth,
      "a replayed backlog must be absorbed: slot min is idempotent")

    // the Jaccard reader reproduces the q439 arithmetic on the store
    val ests = StreamingFeatures.minhashWeeklyJaccard(spark, store).collect()
    assert(ests.nonEmpty)
    val slots = storeRows().groupBy(_._1)
      .map { case (w, rows) => w -> rows.map(r => r._2 -> r._3).toMap }
    ests.foreach { r =>
      val w = r.getAs[Long]("week")
      val m = (0 until Dedup.NumHashes)
        .count(j => slots(w)(j.toLong) == slots(w + 1)(j.toLong)).toLong
      assert(r.getAs[Long]("n_sig_match") === m)
      assert(r.getAs[Long]("est_milli") === m * 1000L / Dedup.NumHashes)
    }
  }

  test("theta materialization restart (r12): the sample store equals a " +
    "one-pass batch build after chunked ingest, restart, AND checkpoint " +
    "loss (k-smallest-of-union absorbs replays by algebra); estimates " +
    "reproduce the q427 arithmetic") {
    // the KMV/theta member of the streaming sketch face, same delivery
    // algebra as bitmap OR and HLL max: the per-week sample is the k+1
    // smallest DISTINCT hashes — a pure function of the value SET, so any
    // replay or re-chunking converges to the identical store. k = 8 keeps
    // the trim path exercised (weeks hold more than 9 distinct users).
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val k = 8
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_theta_restart")
    val chunkFiles = (1 to 2).map { n =>
      val tmp = Files.createTempDirectory(s"thetachunk_$n")
      chunked.filter($"c" === n).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(n: Int): Unit = {
      val dst = dir.resolve(f"chunk-$n%03d.parquet")
      Files.copy(chunkFiles(n - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(4000000L + n * 60000L))
    }
    val ckpt = Files.createTempDirectory("theta_ckpt").toString
    val store = Files.createTempDirectory("theta_store").toString + "/weekly"
    def storeRows(): Set[(Long, Long)] =
      spark.read.parquet(store)
        .select($"week".cast("long"), $"hv".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-pass truth: k+1 smallest distinct hashes per week over ALL events
    val h = graft.ext.Dedup.contentId($"user_id".cast("string"))
    val truth = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        h.cast("long").as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"week").orderBy($"hv".asc)))
      .filter($"rn" <= k + 1).select($"week", $"hv")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    stage(1)
    val run1 = StreamingFeatures.streamThetaUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamThetaUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    assert(storeRows() == truth,
      "incremental sample store must equal the one-pass batch build")

    // checkpoint LOSS: the replay re-unions the same values — absorbed
    val ckpt2 = Files.createTempDirectory("theta_ckpt_lost").toString
    val run3 = StreamingFeatures.streamThetaUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(storeRows() == truth,
      "a replayed backlog must be absorbed: k-smallest-of-union is a " +
        "function of the value set")

    // the estimate reader reproduces the q427 arithmetic on the store:
    // exact-mode weeks (sample not full) estimate EXACTLY; estimating
    // weeks land within the loose 4-sigma ~ 4/sqrt(k-1) gate
    val exact = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"user_id")
      .groupBy($"week").agg(countDistinct($"user_id").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ests = StreamingFeatures.thetaWeeklyEstimates(spark, store, k)
      .collect()
    assert(ests.nonEmpty)
    ests.foreach { r =>
      val week = r.getAs[Long]("week")
      val est = r.getAs[Long]("est_milli")
      val nd = exact(week)
      if (r.getAs[Long]("theta") == 281474976710656L) {
        // exact mode: distinct HASHES seen = the estimate; md5 collisions
        // across user ids could shrink it below nd, never above
        assert(est <= nd * 1000L && est >= (nd - 1) * 1000L,
          s"week $week exact-mode estimate $est vs $nd distinct users")
      } else {
        assert(est > 0L && math.abs(est - nd * 1000L) <= nd * 1000L * 3 / 2,
          s"week $week estimate $est too far from exact $nd")
      }
    }
  }

  test("CMS materialization restart: checkpointed resume conserves per-week " +
    "counts; replays are refused by the batch_id guard; estimates dominate " +
    "exact frequencies") {
    // the frequency member of the streaming sketch face, same delivery
    // algebra as KLL (counter addition is not idempotent): chunked
    // backlog, stop/restart on one checkpoint, then a lost checkpoint
    // whose replay the per-week high-water mark must refuse.
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_cms_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"cmschunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(2000000L + k * 60000L))
    }
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    val store = Files.createTempDirectory("cms_store").toString + "/weekly"
    // per-week item total = the sum of ANY single depth row's counters;
    // row 0 = elements 1..Width
    def storeTotals(): Map[Long, Long] =
      spark.read.parquet(store)
        .select($"week".cast("long"),
          expr(s"aggregate(slice(sk, 1, ${graft.functions.CmsCodec.Width}), " +
            "0L, (acc, x) -> acc + x)"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    stage(1)
    val run1 = StreamingFeatures.streamCmsUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamCmsUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()

    val exactN = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"))
      .groupBy($"week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storeTotals() == exactN,
      "per-week counter mass must equal the exact event count after a " +
        "checkpointed restart (counter addition conserves items)")

    // CMS point estimates never underestimate; spot-check the heaviest
    // (week, user) cells against exact counts
    val exactCells = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"user_id")
      .groupBy($"week", $"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).limit(20)
    val est = spark.read.parquet(store)
      .join(exactCells, Seq("week"))
      .select($"week", $"user_id", $"n",
        graft.functions.GraftFunctions
          .cmsEstimate($"sk", $"user_id".cast("string")).as("e"))
      .collect()
    est.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        s"CMS underestimated (${r.get(0)}, ${r.get(1)})")
    }

    // checkpoint loss: the replay's batchIds 0..1 are dominated by the
    // stored high-water marks — refused, store bit-unchanged
    val ckpt2 = Files.createTempDirectory("cms_ckpt_lost").toString
    val run3 = StreamingFeatures.streamCmsUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(storeTotals() == exactN,
      "a replayed backlog must be REFUSED by the per-week batch_id guard")

    // and the crash-window shape, driven directly: re-apply the SAME
    // (batch content, batchId) pair that batch 1 already wrote — chunk 2
    // with batchId 1. (Replaying different content under a HIGHER batchId
    // is legitimately applied — the guard is a per-week high-water mark,
    // not a content hash.)
    val before = storeTotals()
    StreamingFeatures.cmsApplyBatch(spark,
      spark.read.parquet(chunkFiles(1).toString), raw.schema, store,
      batchId = 1L)
    assert(storeTotals() == before,
      "replaying an applied batchId through cmsApplyBatch must be a no-op")
  }

  test("kllApplyBatch is idempotent per (week, batchId): the crash window " +
    "between partition overwrite and offset commit replays harmlessly") {
    // the exact at-least-once window the streaming harness can't stage:
    // batch B is applied, the offset commit is lost, batch B replays with
    // the SAME batchId. Drive the extracted per-batch body directly:
    // apply(B) twice must leave the store bit-identical, and a later
    // batch (B+1) must still merge normally.
    import java.nio.file.Files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val schema = raw.schema
    val half = raw.filter($"event_id" % 2 === 0)
    val rest = raw.filter($"event_id" % 2 === 1)
    val store = Files.createTempDirectory("kll_apply").toString + "/weekly"
    def snapshot(): Map[Long, (Long, Long)] =
      spark.read.parquet(store)
        .select($"week".cast("long"),
          graft.functions.GraftFunctions.kllBlobN($"sk"),
          $"batch_id".cast("long"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    StreamingFeatures.kllApplyBatch(spark, half, schema, store, batchId = 0L)
    val after0 = snapshot()
    StreamingFeatures.kllApplyBatch(spark, half, schema, store, batchId = 0L)
    assert(snapshot() == after0,
      "replaying batchId 0 must be a per-week no-op (weights would double)")
    StreamingFeatures.kllApplyBatch(spark, rest, schema, store, batchId = 1L)
    val exactN = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"value")
      .groupBy($"week").agg(count($"value").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snapshot().map { case (w, (n, _)) => w -> n } == exactN,
      "batch 1 must merge on top of the deduped batch 0")
    // and a replay of batch 1 after batch 1 is also refused
    StreamingFeatures.kllApplyBatch(spark, rest, schema, store, batchId = 1L)
    assert(snapshot().map { case (w, (n, _)) => w -> n } == exactN)
  }

  test("online materialization restart: checkpoint resumes at the first " +
    "unprocessed file and converges to the batch store") {
    // crash/deploy simulation for streamOnlineMaterialize: run over half
    // the backlog, stop, append the second half, restart with the SAME
    // checkpoint. The restarted query must read ONLY the new file (offsets
    // recovered), the store must converge to the batch twin over the full
    // data, and a third restart with nothing new must process zero rows.
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import graft.store.{FeatureStore, KvSink}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"rchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val ckpt = Files.createTempDirectory("materialize_ckpt").toString
    val chunkRows = chunkFiles.map(p =>
      spark.read.parquet(p.toString).count())

    KvSink.InMemoryKvClient.clear()
    stage(1)
    val run1 = StreamingFeatures.streamOnlineMaterialize(
      spark, dir.toString, () => new KvSink.InMemoryKvClient,
      checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    assert(run1.recentProgress.map(_.numInputRows).sum == chunkRows(0))

    stage(2) // the backlog grows while the query is down
    val run2 = StreamingFeatures.streamOnlineMaterialize(
      spark, dir.toString, () => new KvSink.InMemoryKvClient,
      checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    // offset recovery: ONLY the new file is read, not the full backlog
    assert(run2.recentProgress.map(_.numInputRows).sum == chunkRows(1),
      s"restart must resume after chunk 1: ${run2.recentProgress.map(_.numInputRows).toSeq}")
    val streamed = KvSink.InMemoryKvClient.snapshot

    val gold = FeatureStore.buildGold(spark, sf)
    KvSink.InMemoryKvClient.clear()
    KvSink.materializeOnline(FeatureStore.latestSnapshots(gold),
      () => new KvSink.InMemoryKvClient)
    val batch = KvSink.InMemoryKvClient.snapshot
    assert(streamed.keySet == batch.keySet && streamed.nonEmpty)
    streamed.foreach { case (k, fields) => assert(fields == batch(k), k) }

    // idle restart: nothing new → zero rows processed
    val run3 = StreamingFeatures.streamOnlineMaterialize(
      spark, dir.toString, () => new KvSink.InMemoryKvClient,
      checkpointDir = Some(ckpt))
    run3.processAllAvailable(); run3.stop()
    assert(run3.recentProgress.map(_.numInputRows).sum == 0)
  }

  test("dropDuplicatesWithinWatermark dedups an at-least-once replay across batches") {
    // the same file delivered twice in separate micro-batches (an
    // at-least-once source replay): bounded-state dedup must emit each
    // event once — either suppressed by dedup state or dropped as late,
    // never duplicated
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("events_dup_replay")
    (0 to 1).foreach { k =>
      val dst = dir.resolve(s"part-00$k.parquet")
      Files.copy(Paths.get(s"$sf/events.parquet"), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000L + k * 60000L))
    }
    val q = StreamingFeatures
      .streamDedupWithinWatermark(spark, dir.toString, maxFilesPerTrigger = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    val streamed = spark.table("dedup_wm_out")
    val batchIds = Tables.events(spark, sf).select($"event_id").distinct()
    assert(streamed.count() == batchIds.count())
    assert(streamed.select($"event_id").except(batchIds).count() == 0)
  }

  test("streaming dropDuplicates keeps exactly the distinct event ids") {
    import org.apache.spark.sql.streaming.Trigger
    val q = StreamingFeatures.streamDedup(spark, stageEventsDir())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_out")
    val batchIds = Tables.events(spark, sf).select($"event_id").distinct()
    assert(streamed.count() == batchIds.count())
    assert(streamed.select($"event_id").except(batchIds).count() == 0)
  }

  test("transformWithState event-time timers close exactly the batch sessions") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapUs = 30 * 60 * 1000000L
      val out = StreamingFeatures.statefulSessionTimers(spark,
        stageEventsDir(), gapUs)
      val q = out.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("timer_sessions")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ck_timers").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("timer_sessions")
        .select($"user_id", $"t_start_us", $"t_end_us", $"n_events")
      val batch = graft.ops.Sessions
        .sessionize(Tables.events(spark, sf), gapUs)
        .select($"user_id", $"t_start_us", $"t_end_us", $"n_events")
      assert(streamed.count() > 0)
      // everything emitted is a genuine batch session, byte-for-byte
      assert(streamed.except(batch).count() == 0)
      // every session superseded by a later same-user event (i.e. closed
      // by DATA, not by the trailing watermark) must have been emitted
      val maxTsUs = Tables.events(spark, sf).agg(max($"ts_us"))
        .first().getLong(0)
      val lastEnd = batch.groupBy($"user_id")
        .agg(max($"t_end_us").as("last_end"))
      val dataClosed = batch.join(lastEnd, Seq("user_id"))
        .filter($"t_end_us" < $"last_end")
        .select($"user_id", $"t_start_us", $"t_end_us", $"n_events")
      assert(dataClosed.except(streamed).count() == 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState streaming as-of join equals batch asOfJoin for " +
    "watermark-finalized purchases") {
    import org.apache.spark.sql.streaming.Trigger
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val streamed = try {
      val q = StreamingFeatures.statefulAsOfJoin(spark, stageEventsDir())
        .writeStream.outputMode("append").format("memory")
        .queryName("asof_stream").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table("asof_stream")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
    assert(streamed.count() > 0, "no purchases finalized")
    // batch reference: latest click <= purchase ts per user
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"ts_us".as("c_ts"))
    val batch = graft.ops.Snapshots.asOfJoin(purchases, clicks,
      "user_id", "ts_us", Seq("c_ts"))
      .select($"user_id", $"ts_us".as("p_ts"),
        coalesce($"c_ts", lit(-1L)).as("c_ts"))
    // every streamed row must equal its batch twin
    assert(streamed.except(batch).count() == 0,
      "streamed as-of row disagrees with batch")
    // completeness: purchases safely below the final watermark (union
    // stream: single event-time column, wm = max(click,purchase ts) − 1 h;
    // ms truncation → 1 s slack)
    val maxTs = ev.filter($"event_type".isin("click", "purchase"))
      .agg(max($"ts_us")).head().getLong(0)
    val safe = batch.filter($"p_ts" < maxTs - 3600000000L - 1000000L)
    assert(safe.except(streamed).count() == 0,
      "watermark-finalized purchase missing from the stream")
  }

  test("transformWithState last-k feature equals the batch window (RocksDB store)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two time-ordered half-files + maxFilesPerTrigger=1: a user's
      // purchases span micro-batches, so the ListState MUST merge across
      // batches (a single-batch run never exercises read-modify-write)
      val dir = java.nio.file.Files.createTempDirectory("lastk_stream").toString
      // RAW schema halves (ts keeps its fixture vintage — statefulLastK
      // re-derives ts_us itself, same as every file-source op here).
      // ntile-split on (ts, event_id) is vintage-agnostic, unlike a
      // percentile over ts (timestamp median ≠ long).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sf/events.parquet")
      val halves = raw.withColumn("c", ntile(2).over(
        org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
      halves.filter($"c" === 1).drop("c").coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/b0")
      halves.filter($"c" === 2).drop("c").coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/b1")
      val stage = java.nio.file.Files.createTempDirectory("lastk_in").toString
      def onlyParquet(sub: String, name: String): Unit = {
        val f = new java.io.File(s"$dir/$sub").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(s"$stage/$name"))
      }
      onlyParquet("b0", "part-000.parquet")
      onlyParquet("b1", "part-001.parquet")
      val out = StreamingFeatures.statefulLastK(spark, stage, 3,
        maxFilesPerTrigger = 1)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("last_k")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ck_lastk").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      // Update mode: the final emission per user carries the max n_total
      val streamed = spark.table("last_k")
        .groupBy($"user_id")
        .agg(max(struct($"n_total", $"recent_cents")).as("s"))
        .select($"user_id", $"s.recent_cents".as("recent"), $"s.n_total")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
      val batch = Tables.events(spark, sf)
        .filter($"event_type" === "purchase")
        .withColumn("cents",
          round(coalesce($"value", lit(0.0)) * 100).cast("long"))
        .withColumn("rn", row_number().over(w))
        .groupBy($"user_id")
        .agg(array_join(transform(sort_array(collect_list(
            struct($"rn", $"cents".cast("string").as("c")))),
          x => x.getField("c")), ",").as("all_recent"),
          count(lit(1)).as("n_total"))
        .withColumn("expected", array_join(slice(
          split($"all_recent", ","), 1, 3), ","))
      val got = streamed
        .withColumn("got", array_join(transform($"recent",
          c => c.cast("string")), ","))
      val j = got.join(batch, Seq("user_id"), "full")
      assert(j.filter($"got".isNull || $"expected".isNull ||
        $"got" =!= $"expected" ||
        got("n_total") =!= batch("n_total")).count() == 0)
      assert(streamed.count() > 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("HDR materialization: chunked ingest + checkpointed restart equals " +
    "a one-pass build bucket-for-bucket; replays are refused by the " +
    "batch_id guard; weekly quantile reads respect the 12.5% bound") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_hdr_restart")
    val chunkFiles = (1 to 2).map { k =>
      val tmp = Files.createTempDirectory(s"hdrchunk_$k")
      chunked.filter($"c" === k).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(k: Int): Unit = {
      val dst = dir.resolve(f"chunk-$k%03d.parquet")
      Files.copy(chunkFiles(k - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(3000000L + k * 60000L))
    }
    val ckpt = Files.createTempDirectory("hdr_ckpt").toString
    val store = Files.createTempDirectory("hdr_store").toString + "/weekly"
    def snapshot(path: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .select($"week".cast("long"), $"b_id", $"lb", $"c")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted

    stage(1)
    val run1 = StreamingFeatures.streamHdrUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamHdrUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()

    // one-pass reference build (single batch over the full backlog)
    val store1 = Files.createTempDirectory("hdr_store_1p").toString + "/w"
    StreamingFeatures.hdrApplyBatch(spark, raw, raw.schema, store1, 0L)
    assert(snapshot(store) == snapshot(store1),
      "additive bucket counts must be batching-invariant (chunked + " +
        "restart == one pass), ignoring the batch_id watermark column")

    // counter mass conservation vs the exact event count (v ≥ 1 cent)
    val exactN = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .filter($"v" >= 1L)
      .groupBy($"week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val massed = spark.read.parquet(store)
      .groupBy($"week").agg(sum($"c").as("n"))
      .collect().map(r => r.getAs[Long]("week") -> r.getAs[Long]("n")).toMap
    assert(massed == exactN, "bucket mass must conserve the event count")

    // lost checkpoint: replayed batchIds are dominated by the stored
    // high-water marks — refused, store unchanged
    val before = snapshot(store)
    val ckpt2 = Files.createTempDirectory("hdr_ckpt_lost").toString
    val run3 = StreamingFeatures.streamHdrUpsert(spark, dir.toString,
      store, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(snapshot(store) == before,
      "a replayed backlog must be refused by the per-week batch_id guard")
    // crash-window shape, driven directly: same content, same batchId
    StreamingFeatures.hdrApplyBatch(spark,
      spark.read.parquet(chunkFiles(1).toString), raw.schema, store, 1L)
    assert(snapshot(store) == before,
      "re-applying an already-applied (content, batchId) must be a no-op")

    // reader: estimates are lower bounds within 12.5% of the exact
    // per-week order statistics (exact below 8 cents)
    val perWeek = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .filter($"v" >= 1L)
      .collect().groupBy(_.getAs[Long]("week"))
      .map { case (w, rs) => w -> rs.map(_.getAs[Long]("v")).sorted }
    StreamingFeatures.hdrWeeklyQuantiles(spark, store).collect()
      .foreach { r =>
        val vs = perWeek(r.getAs[Long]("week"))
        assert(r.getAs[Long]("n") === vs.length.toLong)
        val exact = vs((r.getAs[Long]("r") - 1).toInt)
        val est = r.getAs[Long]("est_lb")
        assert(est <= exact, s"week ${r.getAs[Long]("week")} " +
          s"q${r.getAs[Long]("q_pct")}: $est above exact $exact")
        assert(exact - est <= (if (exact < 8) 0L else exact / 9 + 1),
          s"week ${r.getAs[Long]("week")} q${r.getAs[Long]("q_pct")}: " +
            s"est $est misses the 1/9 relative bound vs $exact")
      }
  }

  test("priority-sample materialization (r13): the weekly sample store " +
    "equals a one-pass batch build after chunked ingest, restart, AND " +
    "checkpoint loss (top-k-of-union absorbs replays by algebra); " +
    "estimates reproduce the q442/q493 arithmetic") {
    // the weighted-sampling member of the streaming sketch face, same
    // delivery algebra as theta/bitmap/HLL-max: the per-week sample is
    // the k+1 HIGHEST-priority keyed rows - an order statistic of the
    // row set, so any replay or re-chunking converges to the identical
    // store. k = 8 keeps the trim path exercised.
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val k = 8
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val chunked = raw.withColumn("c", ntile(2).over(
      org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("events_pri_restart")
    val chunkFiles = (1 to 2).map { n =>
      val tmp = Files.createTempDirectory(s"prichunk_$n")
      chunked.filter($"c" === n).drop("c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
    }
    def stage(n: Int): Unit = {
      val dst = dir.resolve(f"chunk-$n%03d.parquet")
      Files.copy(chunkFiles(n - 1), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(5000000L + n * 60000L))
    }
    val ckpt = Files.createTempDirectory("pri_ckpt").toString
    val store = Files.createTempDirectory("pri_store").toString + "/weekly"
    def storeRows(): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(store)
        .select($"week".cast("long"), $"event_id".cast("long"),
          $"w".cast("long"), $"pq".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // one-pass truth: k+1 highest-priority rows per week over ALL events
    val truth = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"), $"event_id",
        expr("CAST(round(coalesce(value, 0.0) * 100) AS BIGINT)").as("w"))
      .withColumn("ug",
        (graft.ext.Dedup.contentId($"event_id".cast("string"))
          % 1000000L) * 2L + 1L)
      .withColumn("pq", expr(
        "CAST(CAST(w AS DECIMAL(38,0)) * 2000000 DIV ug AS BIGINT)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"week").orderBy($"pq".desc, $"event_id".asc)))
      .filter($"rn" <= k + 1)
      .select($"week", $"event_id", $"w", $"pq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    stage(1)
    val run1 = StreamingFeatures.streamPriorityUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run1.processAllAvailable(); run1.stop()
    stage(2)
    val run2 = StreamingFeatures.streamPriorityUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt))
    run2.processAllAvailable(); run2.stop()
    assert(storeRows() == truth,
      "incremental sample store must equal the one-pass batch build")

    // checkpoint LOSS: the replay re-unions the same keyed rows - absorbed
    val ckpt2 = Files.createTempDirectory("pri_ckpt_lost").toString
    val run3 = StreamingFeatures.streamPriorityUpsert(spark, dir.toString,
      store, k = k, maxFilesPerTrigger = 1, checkpointDir = Some(ckpt2))
    run3.processAllAvailable(); run3.stop()
    assert(storeRows() == truth,
      "a replayed backlog must be absorbed: top-k-of-union is a " +
        "function of the keyed row set")

    // the estimate reader: exhaustive weeks (tau = 0) estimate EXACTLY;
    // sampling weeks land within a loose 4-sigma-class band
    val exact = Tables.events(spark, sf)
      .select(expr("ts_us DIV 604800000000").as("week"),
        expr("CAST(round(coalesce(value, 0.0) * 100) AS BIGINT)").as("w"))
      .groupBy($"week").agg(sum($"w").as("t"))
      .collect().map(r => r.getAs[Long]("week") -> r.getAs[Long]("t")).toMap
    val ests = StreamingFeatures.priorityWeeklyEstimates(spark, store, k)
      .collect()
    assert(ests.nonEmpty)
    ests.foreach { r =>
      val week = r.getAs[Long]("week")
      val est = r.getAs[Long]("est_cents")
      val ex = exact(week)
      if (r.getAs[Long]("tau") == 0L) {
        assert(est === ex,
          s"week $week: an exhaustive sample must estimate exactly")
      } else {
        assert(est > 0L && math.abs(est - ex) <= ex,
          s"week $week estimate $est too far from exact $ex")
      }
    }
  }
}
