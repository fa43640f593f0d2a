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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos
    * as a raw long (legacy conf) and expose `ts_us` (epoch microseconds,
    * BIGINT — integer `DIV`, never double division: 1.7e18 nanos exceeds
    * double's 2^53 mantissa) plus a proper `ts` TimestampType column.
    * All window arithmetic downstream is integer math on `ts_us`, which the
    * DuckDB oracle reproduces exactly with `epoch_us(ts)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts DIV 1000L"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
