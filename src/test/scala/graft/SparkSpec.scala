package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run in the
  * forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = SparkEnv.session(cores = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"

  def rows(df: DataFrame): Seq[Map[String, Any]] =
    df.collect().toSeq.map(r =>
      r.schema.fieldNames.zip(r.toSeq).toMap)
}
