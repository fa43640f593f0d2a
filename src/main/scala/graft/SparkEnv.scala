package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Used by tests and ad-hoc mains; `Verify`/`Bench` build their own sessions
  * per the driver contract but apply the same settings.
  *
  * Posture (SURVEY.md §4): UTC session time zone for oracle parity, AQE on
  * (skew-join splitting + shuffle-partition coalescing at scale),
  * shuffle.partitions sized to local cores rather than the 200 default.
  * On a real cluster only master/shuffle.partitions change.
  */
object SparkEnv {
  def session(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // older events.parquet vintages carried TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects without this conf (it then loads
      // as a raw nanos LongType). Current fixtures ship timestamp[us] and
      // the conf is a no-op; Tables.events branches on the loaded dtype
      // and normalizes either vintage to (ts TimestampType, ts_us BIGINT).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine functions + optimizer rewrites are part of the standard session
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GraftFunctions.registerOptimizations(spark)
    spark
  }

  /** Apply runtime-settable engine confs to an externally built session. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
