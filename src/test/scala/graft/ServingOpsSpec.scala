package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.ml.ChurnModel
import graft.store.{FeatureStore, KvSink, LocalInfer, ServingEndpoint}

/** Round-6 reference-surface edges (VERDICT r5 items 7/8):
  * KV TTL + env config (materialize_online.py:55-56,
  * feature_service.py:65-67), the persisted experiment record
  * (make_training_and_train.py:62-93), the `local_infer.py` CLI, and the
  * debug serving endpoints (app.py:120-146). */
class ServingOpsSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()
  private def post(port: Int, path: String) =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString("")).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(port: Int, path: String) =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  // one tiny trained experiment shared by the sidecar + CLI tests
  private lazy val expDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("exp").toString
    val ts = FeatureStore.trainingSet(spark, sf).cache()
    val featCols = FeatureStore.featureNames
    val (model, m) = ChurnModel.trainEval(ts, featCols, maxIter = 2)
    ChurnModel.saveExperiment(dir, model, m, featCols,
      Map("maxIter" -> "2", "stepSize" -> "0.05", "algo" -> "gbt"))
    dir
  }

  private lazy val goldDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("gold_flat").toString
    FeatureStore.buildGold(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  test("KV TTL: keys expire after the reference's REDIS_TTL_SECONDS window") {
    KvSink.InMemoryKvClient.clear()
    var nowMs = 1000000L
    KvSink.InMemoryKvClient.clockMs = () => nowMs
    try {
      val latest = FeatureStore.latestSnapshots(
        FeatureStore.buildGold(spark, sf))
      val n = KvSink.materializeOnline(latest,
        () => new KvSink.InMemoryKvClient, ttlSeconds = Some(60L))
      assert(n > 0)
      val k = KvSink.InMemoryKvClient.snapshot.keySet.head
      assert(KvSink.InMemoryKvClient.ttlMs(k).contains(60000L))
      nowMs += 59000L // still inside the window
      assert(KvSink.InMemoryKvClient.snapshot.size == n)
      nowMs += 2000L // past expiry
      assert(KvSink.InMemoryKvClient.snapshot.isEmpty,
        "expired keys must not be visible")
    } finally KvSink.InMemoryKvClient.clear()
  }

  test("OnlineConfig reads the reference env surface with its defaults") {
    val defaults = KvSink.OnlineConfig.fromEnv(_ => None)
    assert(defaults == KvSink.OnlineConfig("offline", "fs:customer:", None))
    val set = KvSink.OnlineConfig.fromEnv(Map(
      "FEATURE_BACKEND" -> "redis", "REDIS_KEY_PREFIX" -> "p:",
      "REDIS_TTL_SECONDS" -> "3600").get)
    assert(set == KvSink.OnlineConfig("redis", "p:", Some(3600L)))
    // unparseable TTL degrades to None, not a crash
    assert(KvSink.OnlineConfig.fromEnv(
      Map("REDIS_TTL_SECONDS" -> "soon").get).ttlSeconds.isEmpty)
  }

  test("experiment record round-trips: metrics + params + ordered contract") {
    val (model, rec) = ChurnModel.loadExperiment(expDir)
    assert(rec.featureNames == FeatureStore.featureNames,
      "feature_names.txt must preserve contract order")
    assert(rec.params == Map("maxIter" -> "2", "stepSize" -> "0.05",
      "algo" -> "gbt"))
    assert(rec.metrics.auc >= 0.0 && rec.metrics.auc <= 1.0)
    assert(rec.metrics.nTrain > 0 && rec.metrics.nTest > 0)
    // the reloaded model scores — the artifact is complete, not just config
    val p = ServingEndpoint.pipelineScorer(model)(
      Array.fill(rec.featureNames.length)(1.0))
    assert(p >= 0.0 && p <= 1.0)
  }

  test("CLI predict prints the reference's JSON shape for one customer") {
    val someUser = FeatureStore.latestSnapshots(
      FeatureStore.buildGold(spark, sf))
      .orderBy(org.apache.spark.sql.functions.col("user_id"))
      .head().getAs[Long]("user_id")
    val out = LocalInfer.run(spark, "predict", Map(
      "features" -> goldDir, "experiment" -> expDir,
      "customer-id" -> someUser.toString, "latest" -> "true"))
    assert(out.contains(s""""customer_id": $someUser"""), out)
    assert(out.contains("\"probability\"") && out.contains("\"prediction\""),
      out)
    assert(out.contains("\"t_ref\""), out)
    // t_ref before any snapshot → the reference's no-snapshot failure
    intercept[NoSuchElementException] {
      LocalInfer.run(spark, "predict", Map(
        "features" -> goldDir, "experiment" -> expDir,
        "customer-id" -> someUser.toString, "t-ref" -> "1990-01-01"))
    }
  }

  test("CLI predict-batch scores N latest snapshots and writes CSV") {
    val csv = LocalInfer.run(spark, "predict-batch", Map(
      "features" -> goldDir, "experiment" -> expDir, "n" -> "5"))
    val lines = csv.split("\n")
    assert(lines.head == "customer_id,t_ref,prediction,probability")
    assert(lines.length == 6, csv)
    // ascending customer_id, one row each
    val ids = lines.tail.map(_.split(",")(0).toLong)
    assert(ids.sorted.sameElements(ids) && ids.distinct.length == 5)

    val outPath = java.nio.file.Files.createTempDirectory("cli").toString +
      "/preds.csv"
    val msg = LocalInfer.run(spark, "predict-batch", Map(
      "features" -> goldDir, "experiment" -> expDir, "n" -> "3",
      "out" -> outPath))
    assert(msg.contains("Wrote 3 rows"), msg)
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outPath)))
    assert(written.split("\n").length == 4)
  }

  test("/debug/write_test + /debug/log_state mirror the reference ops loop") {
    val predsDir = java.nio.file.Files.createTempDirectory("preds").toString
    val featsDir = java.nio.file.Files.createTempDirectory("feats").toString
    // one parquet file under the features dir so the count is non-zero
    FeatureStore.buildGold(spark, sf).limit(10).coalesce(1)
      .write.mode("overwrite").parquet(s"$featsDir/features_customer")
    val ep = new ServingEndpoint(
      () => FeatureStore.buildGold(spark, sf),
      FeatureStore.featureNames, _ => 0.5, "test",
      predsDir = Some(predsDir), featuresDir = Some(featsDir))
    val port = ep.start()
    try {
      val s0 = get(port, "/debug/log_state")
      assert(s0.statusCode() == 200, s0.body())
      assert(s0.body().contains("\"pred_files\": 0"), s0.body())
      assert(!s0.body().contains("\"feature_files\": 0"), s0.body())

      val w = post(port, "/debug/write_test")
      assert(w.statusCode() == 200, w.body())
      assert(w.body().contains("\"wrote\""), w.body())
      assert(w.body().contains("date="), "test record must land in a " +
        "dated partition dir: " + w.body())

      val s1 = get(port, "/debug/log_state")
      assert(s1.body().contains("\"pred_files\": 1"), s1.body())

      // GET on write_test → 405; unconfigured predsDir → 503
      assert(get(port, "/debug/write_test").statusCode() == 405)
    } finally ep.stop()

    val bare = new ServingEndpoint(
      () => FeatureStore.buildGold(spark, sf),
      FeatureStore.featureNames, _ => 0.5, "test")
    val p2 = bare.start()
    try assert(post(p2, "/debug/write_test").statusCode() == 503)
    finally bare.stop()
  }
}
