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
}
