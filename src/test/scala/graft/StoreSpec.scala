package graft

import org.apache.spark.sql.functions._
import graft.store.{FeatureStore, KvSink}

/** M3/M4 serving-path behavior: gold write/read roundtrip with partition
  * pruning, snapshot lookup, vector alignment contract, KV materialization,
  * prediction-log append semantics. */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  test("gold write → partitioned layout, re-read equals source, rerun idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("gold").toString
    val gold = FeatureStore.buildGold(spark, sf)
    FeatureStore.writeGold(gold, dir)
    FeatureStore.writeGold(gold, dir) // dynamic-overwrite rerun must not dup
    val back = spark.read.parquet(dir)
    assert(back.count() == gold.count())
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("date=")))
  }

  test("single-key snapshot equals the batch as-of row for that key") {
    val gold = FeatureStore.buildGold(spark, sf).cache()
    val asOf = 1705276800000000L
    val batch = FeatureStore.snapshotsAsOf(gold, asOf)
      .filter($"user_id" === 7L).collect()
    val single = FeatureStore.snapshot(gold, 7L, asOf)
    assert(single.isDefined == batch.nonEmpty)
    for (s <- single; b <- batch.headOption)
      assert(s("event_id") == b.getAs[Long]("event_id"))
  }

  test("alignVector: contract order, missing → 0.0, all double") {
    val df = Seq((1L, 5L)).toDF("user_id", "txn_count_7d")
    val out = FeatureStore.alignVector(df, FeatureStore.featureNames)
    assert(out.columns.toSeq == FeatureStore.featureNames)
    assert(out.schema.fields.forall(_.dataType.typeName == "double"))
    val r = out.collect()(0)
    assert(r.getAs[Double]("txn_count_7d") == 5.0)
    assert(r.getAs[Double]("spend_1d") == 0.0)
  }

  test("KV materialization writes one hash per user with stringified fields") {
    KvSink.InMemoryKvClient.clear()
    val gold = FeatureStore.buildGold(spark, sf)
    val snaps = FeatureStore.latestSnapshots(gold)
    val n = KvSink.materializeOnline(snaps, () => new KvSink.InMemoryKvClient)
    val store = KvSink.InMemoryKvClient.snapshot
    assert(n == snaps.count() && store.size == n)
    val (k, fields) = store.head
    assert(k.startsWith("fs:customer:"))
    assert(fields.contains("spend_7d") && fields.contains("meta:ts_us"))
    assert(fields("spend_7d").toDouble >= 0.0) // stringified numeric
  }

  test("upsertGold: updated keys replaced, new keys appended, others intact") {
    import graft.store.FeatureStore
    val dir = java.nio.file.Files.createTempDirectory("gold_upsert").toString
    val base = Seq((1L, 100L, 1705276800000000L, 10.0), (2L, 200L, 1705276800000000L, 20.0))
      .toDF("user_id", "event_id", "ts_us", "spend_7d")
    FeatureStore.writeGold(base, dir)
    val updates = Seq((2L, 201L, 1705363200000000L, 99.0), (3L, 300L, 1705363200000000L, 30.0))
      .toDF("user_id", "event_id", "ts_us", "spend_7d")
    FeatureStore.upsertGold(spark, dir, updates, Seq("user_id"))
    val got = spark.read.parquet(dir)
      .select($"user_id", $"spend_7d").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0)) // replace, keep, add
  }

  test("upsertGold removes stale rows when a key moves to a new date partition") {
    import graft.store.FeatureStore
    val dir = java.nio.file.Files.createTempDirectory("gold_move").toString
    val day1 = 1705276800000000L // 2024-01-15
    val day2 = day1 + 86400000000L
    val base = Seq((1L, 100L, day1, 10.0), (2L, 200L, day1, 20.0))
      .toDF("user_id", "event_id", "ts_us", "spend_7d")
    FeatureStore.writeGold(base, dir)
    // key 2's update lands on day2 — the stale day1 row must be rewritten away
    val updates = Seq((2L, 201L, day2, 99.0))
      .toDF("user_id", "event_id", "ts_us", "spend_7d")
    FeatureStore.upsertGold(spark, dir, updates, Seq("user_id"))
    val got = spark.read.parquet(dir)
      .select($"user_id", $"spend_7d").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 99.0))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("eraseKeys deletes every trace, rewrites only affected partitions, drops emptied ones") {
    import graft.store.FeatureStore
    val dir = java.nio.file.Files.createTempDirectory("gold_erase").toString
    val day1 = 1705276800000000L // 2024-01-15
    val day2 = day1 + 86400000000L
    val day3 = day2 + 86400000000L
    // day1: users 1,2 — day2: user 3 only (fully erased) — day3: user 4
    val base = Seq(
      (1L, 100L, day1, 10.0), (2L, 200L, day1, 20.0),
      (3L, 300L, day2, 30.0), (4L, 400L, day3, 40.0))
      .toDF("user_id", "event_id", "ts_us", "spend_7d")
    FeatureStore.writeGold(base, dir)
    val day3Dir = new java.io.File(dir, "date=2024-01-17")
    val day3MTimes = day3Dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    val erased = FeatureStore.eraseKeys(spark, dir,
      Seq(2L, 3L, 99L).toDF("user_id"), Seq("user_id"))
    assert(erased === 2L) // user 99 has no rows
    val left = spark.read.parquet(dir)
    assert(left.select($"user_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // the fully-erased day2 partition directory is GONE (dynamic overwrite
    // alone would have left its files behind)
    assert(!new java.io.File(dir, "date=2024-01-16").exists())
    // the untouched day3 partition was not rewritten (same files, same mtimes)
    assert(day3Dir.listFiles().map(f => f.getName -> f.lastModified).toMap
      == day3MTimes)
    // no keys hit ⇒ no-op; missing table ⇒ 0, never an error
    assert(FeatureStore.eraseKeys(spark, dir,
      Seq(98L).toDF("user_id"), Seq("user_id")) === 0L)
    assert(FeatureStore.eraseKeys(spark, dir + "_missing",
      Seq(1L).toDF("user_id"), Seq("user_id")) === 0L)
  }

  test("versioned gold: pinned versions immutable, _LATEST flips atomically") {
    import graft.store.FeatureStore
    val dir = java.nio.file.Files.createTempDirectory("gold_versions").toString + "/t"
    val v1data = Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "spend")
    val v2data = Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)).toDF("user_id", "spend")
    assert(FeatureStore.writeGoldVersioned(v1data, dir) === 1)
    assert(FeatureStore.writeGoldVersioned(v2data, dir) === 2)
    assert(FeatureStore.listGoldVersions(spark, dir) === Seq(1, 2))
    // latest = v2; pinned v1 unchanged (a training run recording v=1 is
    // exactly re-buildable after any number of later writes)
    val latest = FeatureStore.readGoldVersion(spark, dir)
      .select($"user_id", $"spend").as[(Long, Double)].collect().toMap
    assert(latest === Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    val v1 = FeatureStore.readGoldVersion(spark, dir, Some(1))
      .select($"user_id", $"spend").as[(Long, Double)].collect().toMap
    assert(v1 === Map(1L -> 10.0, 2L -> 20.0))
  }

  test("prediction log appends (never clobbers) under date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("predlog").toString
    val preds = Seq((1L, 1705276800000000L, 0.9, 1))
      .toDF("user_id", "ts_us", "probability", "prediction")
    FeatureStore.logPredictions(preds, dir)
    FeatureStore.logPredictions(preds, dir)
    assert(spark.read.parquet(dir).count() == 2) // append semantics
  }

  test("expireOldPartitions drops exactly the pre-cutoff dates, metadata-only") {
    val dir = java.nio.file.Files.createTempDirectory("retention").toString
    // three partition dates: Jan 10, Jan 15, Jan 20 (epoch micros, UTC)
    val rows = Seq(
      (1L, 1704844800000000L, 10.0), // 2024-01-10
      (2L, 1705276800000000L, 20.0), // 2024-01-15
      (3L, 1705708800000000L, 30.0)) // 2024-01-20
      .toDF("user_id", "ts_us", "value")
    FeatureStore.writeGold(rows, dir)
    val dropped = FeatureStore.expireOldPartitions(spark, dir,
      java.time.LocalDate.parse("2024-01-15"))
    assert(dropped.sorted == Seq("2024-01-10"))
    val left = spark.read.parquet(dir)
    assert(left.count() == 2)
    assert(left.select($"user_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
    // idempotent; missing table is a no-op, never an error
    assert(FeatureStore.expireOldPartitions(spark, dir,
      java.time.LocalDate.parse("2024-01-15")).isEmpty)
    assert(FeatureStore.expireOldPartitions(spark, dir + "_missing",
      java.time.LocalDate.parse("2024-01-15")).isEmpty)
  }

  test("schema evolution: mergeSchema unions columns, old files read null") {
    // the additive-column evolution a long-lived gold table goes through:
    // v1 files lack the new feature; a merged read surfaces it as NULL
    // there (never a hard failure), and per-file pruning still works
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, 10L), (2L, 20L)).toDF("user_id", "f1")
      .write.mode("append").parquet(dir)
    Seq((3L, 30L, 0.5)).toDF("user_id", "f1", "f2")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.sameElements(Array("f1", "f2", "user_id")))
    assert(merged.count() == 3)
    assert(merged.filter($"f2".isNull).count() == 2) // v1 rows
    assert(merged.filter($"user_id" === 3L).head().getAs[Double]("f2") == 0.5)
    // without mergeSchema the footer actually read wins — both orders are
    // valid reads (parquet picks one file's schema); the merged read is the
    // contract the store exposes for evolved tables
  }

  test("bitmap AND/cardinality: exact intersection on the codec and in SQL") {
    import graft.functions.BitmapCodec
    val a: BitmapCodec.State = scala.collection.mutable.LongMap.empty
    val b: BitmapCodec.State = scala.collection.mutable.LongMap.empty
    Seq(1L, 2L, 65536L, 999999L).foreach(BitmapCodec.set(a, _))
    Seq(2L, 3L, 999999L, 123456789L).foreach(BitmapCodec.set(b, _))
    assert(BitmapCodec.andCardinality(a, b) === 2L) // {2, 999999}
    // through the SQL function surface
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L))
      .toDF("grp", "id")
    val sk = df.groupBy($"grp")
      .agg(graft.functions.GraftFunctions.bitmapSketch($"id").as("s"))
    val pair = sk.filter($"grp" === 1L).select($"s".as("s1"))
      .crossJoin(sk.filter($"grp" === 2L).select($"s".as("s2")))
      .select(
        graft.functions.GraftFunctions.bitmapAndCount($"s1", $"s2"),
        graft.functions.GraftFunctions.bitmapCount($"s1"))
      .as[(Long, Long)].head()
    assert(pair === ((1L, 2L))) // overlap {20}; |{10,20}| = 2
  }
}
