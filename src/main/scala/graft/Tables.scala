package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver fixture tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Every reader takes the sf directory explicitly so the same query code runs
  * at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) — and, on a real
  * cluster, at any path. Parquet scans get partition/column pruning and filter
  * pushdown from Catalyst for free; do NOT cache here (callers decide).
  *
  * Reference data-model mapping: SURVEY.md §1.3 — the fixtures stand in for
  * the reference's bronze `orders` table (reference:
  * jobs/ingest_xlsx_to_parquet.py:14-42) and gold feature view.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet has shipped with two `ts` physical types across fixture
    * vintages: parquet TIMESTAMP(NANOS) (read as a raw nanos long via the
    * legacy conf, since Spark's reader otherwise rejects it) and
    * timestamp[us] (reads as TIMESTAMP / TIMESTAMP_NTZ). We branch on the
    * loaded dtype and normalize both to the same two columns: `ts_us`
    * (epoch microseconds, BIGINT — integer arithmetic, never double
    * division: 1.7e18 nanos exceeds double's 2^53 mantissa) and a proper
    * TimestampType `ts`. The session runs in UTC, so casting an NTZ value
    * to TIMESTAMP is an identity on the instant. All window arithmetic
    * downstream is integer math on `ts_us`, which the DuckDB oracle
    * reproduces exactly with `epoch_us(ts)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) vintage, loaded as raw nanos
        raw
          .withColumn("ts_us", expr("ts DIV 1000L"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ => // timestamp[us] vintage (TIMESTAMP or TIMESTAMP_NTZ)
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_us", unix_micros(col("ts")))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
