package graft

import org.apache.spark.sql.types._

/** S1 deviation path (SURVEY §7.9): bronze ingestion from CSV raw drops with
  * an EXPLICIT schema (no inference in production paths, SURVEY §1.2) —
  * roundtrip fidelity including null-on-error casts (O2). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("CSV raw drop roundtrips through the explicit bronze schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv_drop").toString
    val src = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts_us", $"event_type", $"value")
    src.write.option("header", "true").csv(s"$dir/drop1")

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema)
      .csv(s"$dir/drop1")
    assert(back.count() == src.count())
    assert(back.schema == schema)
    // value survives as the same double (CSV writes shortest-roundtrip repr)
    val a = src.agg(sum($"value")).as[Double].collect()(0)
    val b = back.agg(sum($"value")).as[Double].collect()(0)
    assert(math.abs(a - b) < 1e-9)
  }

  test("null-on-error casts (O2): malformed numerics become null, not errors") {
    val dir = java.nio.file.Files.createTempDirectory("csv_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,qty\n1,5\n2,notanumber\n3,\n")
    // PERMISSIVE mode + nullable schema = pandas to_numeric(errors='coerce')
    val back = spark.read.option("header", "true")
      .schema("id INT, qty INT").csv(s"$dir/bad.csv")
    val rows = back.orderBy($"id").collect()
    assert(rows.length == 3)
    assert(rows(0).getInt(1) == 5)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("ORC interchange (r12): a gold-shaped frame roundtrips through the " +
    "native ORC source value- and schema-exact, with predicate pushdown " +
    "reaching the scan") {
    // Spark ships ORC natively (orc-core in the unmanaged classpath);
    // spark-avro is an external module and is NOT in /opt/spark/jars
    // (re-checked 2026-08-16 r12), so ORC is the second columnar
    // interchange format beside parquet. Integer/string/double columns —
    // the gold-feature shapes — must survive bit-exactly.
    val dir = java.nio.file.Files.createTempDirectory("orc_gold").toString
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    src.write.mode("overwrite").orc(s"$dir/gold")
    val back = spark.read.orc(s"$dir/gold")
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    val a = src.agg(sum($"cents"), sum($"o_orderkey")).collect()(0)
    val b = back.agg(sum($"cents"), sum($"o_orderkey")).collect()(0)
    assert(a === b)
    // pushdown parity with the parquet path: an equality filter must
    // reach the ORC scan as a pushed filter, not a post-scan Filter only
    val plan = back.filter($"o_orderkey" === 7L).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), " +
      "EqualTo(o_orderkey,7)]") || plan.contains("EqualTo(o_orderkey,7)"),
      s"ORC scan did not receive the pushed filter:\n$plan")
  }
}
