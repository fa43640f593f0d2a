package graft

import graft.ml.ChurnModel
import graft.store.FeatureStore

/** E3/E5 pipeline-shape parity: ordered split in → (model, AUC, F1) out,
  * threshold scoring. */
class ChurnModelSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("GBT churn pipeline trains on the ordered split and scores sanely") {
    val ts = FeatureStore.trainingSet(spark, sf).cache()
    val featCols = FeatureStore.featureNames
    val (model, m) = ChurnModel.trainEval(ts, featCols, maxIter = 5)
    assert(m.nTrain > 0 && m.nTest > 0)
    assert(m.auc >= 0.0 && m.auc <= 1.0)
    assert(m.f1 >= 0.0 && m.f1 <= 1.0)
    val scored = ChurnModel.scoreWithThreshold(model, ts.limit(10), 0.5)
    val r = scored.select(col("probability_1"), col("prediction_at_threshold"))
      .collect()
    assert(r.forall(x => x.getDouble(0) >= 0 && x.getDouble(0) <= 1))
    assert(r.forall(x => Set(0, 1)(x.getInt(1))))
  }
}
