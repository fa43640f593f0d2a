package graft

import org.apache.spark.sql.SparkSession

/** Dev main: dump formatted physical plans for named queries (plan review —
  * SURVEY.md §4 posture: verify window fusion, pushdown, broadcast choices).
  *
  * `--census` mode prints one TSV row per query instead of full plans:
  * parquet-scan count, Exchange count, Generate count, InMemoryRelation
  * refs, and whether any higher-order lambda survives in the physical plan
  * — the structural-waste screen used for the bench-tail sweeps (a high
  * scan count without a matching cache is a shared subtree replanned per
  * consumer; a lambdafunction is an interpreted per-row allocation). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session(cores = 4, appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val census = args.headOption.contains("--census")
    val names =
      if (census && args.length > 1) args.drop(1).toSeq // census of a subset
      else if (args.nonEmpty && !census) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    if (census) println("query\tscans\texchanges\tgenerates\timr\tlambda")
    for (n <- names) {
      if (census) {
        // clear shared cache so counts reflect the fresh-session shape
        spark.sharedState.cacheManager.clearCache()
        try {
          val p = SparkEntry.queries(n)(spark, dir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*"""))
          val exch = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
          val gens = p.linesIterator.count(_.matches("""\(\d+\) Generate.*"""))
          val imr = p.linesIterator.count(_.contains("InMemoryRelation"))
          val lam = p.contains("lambdafunction")
          println(s"$n\t$scans\t$exch\t$gens\t$imr\t$lam")
        } catch { case e: Throwable => println(s"$n\tERR\t$e") }
      } else {
        println(s"\n========== $n ==========")
        try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}
