package graft.ml

import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E3 — churn-model training pipeline, `spark.ml` shape parity with the
  * reference's LightGBM job (reference: jobs/make_training_and_train.py:61-93:
  * train on the ordered 80% prefix, evaluate AUC + F1@0.5 on the rest, save
  * the model + the ordered feature-name contract).
  *
  * Exact LightGBM parity is out of engine scope (different algorithm,
  * SURVEY.md §2.6 E3); what's replicated is the pipeline contract: ordered
  * split in, (model artifact, feature_names, AUC, F1) out.
  */
object ChurnModel {

  case class Metrics(auc: Double, f1: Double, nTrain: Long, nTest: Long)

  /** Train on split=="train", evaluate on split=="test". `features` must
    * contain the contract columns + `churn` + `split`. */
  def trainEval(training: DataFrame, featureCols: Seq[String],
                maxIter: Int = 20): (PipelineModel, Metrics) = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val gbt = new GBTClassifier()
      .setLabelCol("churn").setFeaturesCol("features")
      .setMaxIter(maxIter).setStepSize(0.05).setSubsamplingRate(0.9)
      .setSeed(42L)
    val pipeline = new Pipeline().setStages(Array(assembler, gbt))

    val train = training.filter(col("split") === "train")
    val test = training.filter(col("split") === "test")
    val model = pipeline.fit(train)
    val scored = model.transform(test)

    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("churn").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    val f1 = new MulticlassClassificationEvaluator()
      .setLabelCol("churn").setPredictionCol("prediction")
      .setMetricName("f1").evaluate(scored)
    (model, Metrics(auc, f1, train.count(), test.count()))
  }

  /** E4 — persisted experiment record (reference:
    * jobs/make_training_and_train.py:62-93: MLflow log_params + log_metrics
    * + model artifact + the feature-name text file). The engine has no
    * MLflow server, so the auditable record is a SIDECAR next to the saved
    * model:
    *
    *   dir/model/              Spark ML PipelineModel (the artifact)
    *   dir/feature_names.txt   ordered contract, one per line — byte-level
    *                           parity with the reference's
    *                           `FEAT_NAMES_PATH.read_text().splitlines()`
    *   dir/experiment.json     flat JSON: metrics + `param:*` entries
    *
    * Everything round-trips through [[loadExperiment]]; the record outlives
    * the JVM, which the bare in-memory [[Metrics]] did not.
    */
  case class ExperimentRecord(metrics: Metrics, params: Map[String, String],
                              featureNames: Seq[String])

  def saveExperiment(dir: String, model: PipelineModel, metrics: Metrics,
                     featureCols: Seq[String],
                     params: Map[String, String]): Unit = {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    model.write.overwrite().save(s"$dir/model")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "feature_names.txt"),
      featureCols.mkString("\n").getBytes(UTF_8))
    val kvs: Seq[(String, Any)] =
      Seq[(String, Any)]("auc" -> metrics.auc, "f1" -> metrics.f1,
        "n_train" -> metrics.nTrain, "n_test" -> metrics.nTest) ++
        params.toSeq.sortBy(_._1).map { case (k, v) =>
          (s"param:$k", v: Any)
        }
    Files.write(Paths.get(dir, "experiment.json"),
      graft.store.ServingEndpoint.obj(kvs: _*).getBytes(UTF_8))
  }

  def loadExperiment(dir: String): (PipelineModel, ExperimentRecord) = {
    import java.nio.file.{Files, Paths}
    import java.nio.charset.StandardCharsets.UTF_8
    val model = PipelineModel.load(s"$dir/model")
    val names = new String(
      Files.readAllBytes(Paths.get(dir, "feature_names.txt")), UTF_8)
      .split("\n").toSeq
    val flat = graft.store.ServingEndpoint.Json.parseFlat(new String(
      Files.readAllBytes(Paths.get(dir, "experiment.json")), UTF_8))
      .getOrElse(throw new IllegalStateException(
        s"unreadable experiment.json under $dir"))
    def d(k: String) = flat(k).asInstanceOf[java.lang.Double].doubleValue
    val rec = ExperimentRecord(
      Metrics(d("auc"), d("f1"), d("n_train").toLong, d("n_test").toLong),
      flat.collect { case (k, v) if k.startsWith("param:") =>
        k.stripPrefix("param:") -> String.valueOf(v)
      },
      names)
    (model, rec)
  }

  /** E5 — threshold scoring (reference: serving/app.py:47-48): probability
    * of class 1 vs a request-supplied threshold. */
  def scoreWithThreshold(model: PipelineModel, df: DataFrame,
                         threshold: Double): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    model.transform(df)
      .withColumn("probability_1", p1)
      .withColumn("prediction_at_threshold",
        when(p1 >= threshold, 1).otherwise(0))
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
