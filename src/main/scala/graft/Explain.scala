package graft

import org.apache.spark.sql.SparkSession

/** Dev main: dump formatted physical plans for named queries (plan review —
  * SURVEY.md §4 posture: verify window fusion, pushdown, broadcast choices). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session(cores = 4, appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
